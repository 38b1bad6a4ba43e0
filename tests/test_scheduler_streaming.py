"""Cron wave scheduler (T1/T2) + Structured Streaming surface tests."""

from datetime import datetime, timezone

import pytest

from downloader_spark.plans.scheduler import (
    Cron,
    CronError,
    ScheduleState,
    due_waves,
)


def _dt(*args):
    return datetime(*args, tzinfo=timezone.utc)


class TestCron:
    def test_parse_and_next(self):
        c = Cron.parse("*/15 * * * *")
        assert c.next_fire(_dt(2026, 1, 1, 10, 0)) == _dt(2026, 1, 1, 10, 15)
        assert c.next_fire(_dt(2026, 1, 1, 10, 14)) == _dt(2026, 1, 1, 10, 15)

    def test_daily(self):
        c = Cron.parse("30 6 * * *")
        assert c.next_fire(_dt(2026, 1, 1, 7, 0)) == _dt(2026, 1, 2, 6, 30)

    def test_dow(self):
        c = Cron.parse("0 0 * * 1")  # Mondays
        nxt = c.next_fire(_dt(2026, 1, 1, 0, 0))  # Thursday
        assert nxt == _dt(2026, 1, 5, 0, 0)
        assert nxt.isoweekday() == 1

    def test_dom_dow_or_rule(self):
        c = Cron.parse("0 0 15 * 1")  # 15th OR Monday
        nxt = c.next_fire(_dt(2026, 1, 9, 1, 0))
        assert nxt == _dt(2026, 1, 12, 0, 0)  # Monday before the 15th

    def test_ranges_and_lists(self):
        c = Cron.parse("5,35 9-17 * * 1-5")
        nxt = c.next_fire(_dt(2026, 1, 2, 16, 40))  # Friday
        assert nxt == _dt(2026, 1, 2, 17, 5)

    @pytest.mark.parametrize(
        "bad", ["* * * *", "61 * * * *", "* 25 * * *", "x * * * *", "*/0 * * * *", "1-99 * * * *"]
    )
    def test_invalid(self, bad):
        with pytest.raises(CronError):
            Cron.parse(bad if len(bad) >= 9 else bad + "      ")

    def test_length_bounds(self):
        with pytest.raises(CronError):
            Cron.parse("* * * * *".ljust(101))


class TestDueWaves:
    def test_coalesce_missed_runs(self):
        s = ScheduleState("s1", "*/10 * * * *", last_fire=_dt(2026, 1, 1, 10, 0))
        due, misfired = due_waves([s], _dt(2026, 1, 1, 11, 0, 30), grace_seconds=60)
        # missed 10:10..11:00 → coalesced to the latest (11:00), in grace
        assert due == [("s1", _dt(2026, 1, 1, 11, 0))]
        assert misfired == []

    def test_misfire_beyond_grace(self):
        s = ScheduleState("s1", "0 * * * *", last_fire=_dt(2026, 1, 1, 10, 0))
        due, misfired = due_waves([s], _dt(2026, 1, 1, 12, 30), grace_seconds=60)
        assert due == []
        assert misfired == [("s1", _dt(2026, 1, 1, 12, 0))]

    def test_disabled_skipped(self):
        s = ScheduleState("s1", "* * * * *", enabled=False)
        due, misfired = due_waves([s], _dt(2026, 1, 1, 12, 0), grace_seconds=3600)
        assert due == [] and misfired == []


class TestStreaming:
    def test_windowed_counts_stream_equals_batch(self, spark, tmp_path):
        from downloader_spark.streaming.events import (
            read_events_stream,
            run_available_now,
            windowed_event_counts,
        )

        src = str(tmp_path / "events_src")
        ckpt = str(tmp_path / "ckpt")
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        ev.write.parquet(src)

        stream = read_events_stream(spark, src, ev.schema)
        assert stream.isStreaming
        agg = windowed_event_counts(stream, window="6 hours", watermark="1 hour")
        q = run_available_now(agg, ckpt)
        got = {
            (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
            for r in spark.sql("SELECT * FROM stream_out").collect()
        }
        q.stop()

        batch = windowed_event_counts(ev, window="6 hours", watermark="1 hour")
        want = {
            (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
            for r in batch.collect()
        }
        assert got == want

    def test_sessionize_runs(self, spark, tmp_path):
        from downloader_spark.streaming.events import (
            read_events_stream,
            run_available_now,
            sessionize,
        )

        src = str(tmp_path / "events_src2")
        ckpt = str(tmp_path / "ckpt2")
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(200)
        ev.write.parquet(src)
        stream = read_events_stream(spark, src, ev.schema)
        q = run_available_now(sessionize(stream, gap="1 hour"), ckpt)
        rows = spark.sql("SELECT * FROM stream_out").collect()
        q.stop()
        assert len(rows) > 0
        for r in rows:
            assert r["session_end"] >= r["session_start"]
            assert r["n_events"] >= 1


class TestMultimodal:
    def test_media_features_plumbing(self, spark):
        from downloader_spark.multimodal import (
            media_features_udf,
            sample_frames_plan,
            synth_media_from_embeddings,
        )

        media = synth_media_from_embeddings(spark, "/root/testdata/sf0.001")
        feats = media_features_udf(media)
        rows = feats.limit(10).collect()
        assert len(rows) == 10
        for r in rows:
            assert r["n_bytes"] > 0
            assert 0.0 <= r["byte_entropy"] <= 4.0  # 16 bins → ≤ log2(16)
            assert len(r["histogram"]) == 16
            assert sum(r["histogram"]) == r["n_bytes"]

        frames = sample_frames_plan(media.limit(5), every_ms=500)
        frows = frames.collect()
        assert len(frows) > 5  # exploded
        for r in frows:
            assert r["frame_ts_ms"] % 500 == 0

    def test_decode_stub_gated(self):
        import pytest as _pytest

        from downloader_spark.multimodal import decode_image_stub

        with _pytest.raises(NotImplementedError):
            decode_image_stub(b"\x00" * 100)
        fake = decode_image_stub(b"\x00" * 100, deterministic_fake=True)
        assert fake.shape == (10, 10)

    def test_media_feature_values_match_python_recompute(self, spark):
        """Not just plumbing: n_bytes/mean/entropy/histogram must equal
        a pure-python recompute over the same payload bytes (the
        rows-only driver check for media_features leans on this)."""
        import math

        from downloader_spark.multimodal import (
            media_features_udf,
            synth_media_from_embeddings,
        )

        media = synth_media_from_embeddings(spark, "/root/testdata/sf0.001")
        sample = media.limit(20)
        payloads = {r["media_id"]: bytes(r["payload"]) for r in sample.collect()}
        feats = {r["media_id"]: r for r in media_features_udf(sample).collect()}
        for mid, blob in payloads.items():
            n = len(blob)
            hist = [0] * 16
            for b in blob:
                hist[b >> 4] += 1
            mean = round(sum(blob) / n, 6)
            ent = round(-sum((c / n) * math.log2(c / n) for c in hist if c), 6)
            r = feats[mid]
            assert r["n_bytes"] == n
            assert r["byte_sum"] == sum(blob)
            assert r["byte_mean"] == mean
            assert r["byte_entropy"] == ent
            assert list(r["histogram"]) == hist

    def test_resize_block_mean_matches_numpy_recompute(self, spark):
        """Resize plumbing: decode(fake) → exact integer block-mean
        downsample; sums and digests must equal a pure-numpy recompute
        over the same payload bytes, and tiny payloads clamp out_side
        to the decoded side."""
        import hashlib

        import numpy as np

        from downloader_spark.multimodal import (
            decode_image_stub,
            resize_block_mean_udf,
            synth_media_from_embeddings,
        )

        media = synth_media_from_embeddings(spark, "/root/testdata/sf0.001")
        sample = media.limit(15)
        payloads = {r["media_id"]: bytes(r["payload"]) for r in sample.collect()}
        got = {
            r["media_id"]: r
            for r in resize_block_mean_udf(sample, out_side=8).collect()
        }
        for mid, blob in payloads.items():
            img = decode_image_stub(blob, deterministic_fake=True)
            side = img.shape[0]
            k = min(8, side)
            bounds = (np.arange(k + 1) * side) // k
            small = np.empty((k, k), dtype=np.int64)
            for i in range(k):
                for j in range(k):
                    blk = img[bounds[i]:bounds[i+1], bounds[j]:bounds[j+1]]
                    small[i, j] = int(blk.sum()) // blk.size
            r = got[mid]
            assert r["in_side"] == side and r["out_side"] == k
            assert r["pixel_sum"] == int(small.sum())
            assert r["pixel_digest"] == hashlib.md5(
                small.astype(np.uint8).tobytes()
            ).hexdigest()
        # tiny payload → decoded side < out_side → clamped, no crash
        tiny = spark.createDataFrame(
            [(1, bytearray(b"abcdef"))], "media_id long, payload binary"
        )
        row = resize_block_mean_udf(tiny, out_side=8).collect()[0]
        assert row["in_side"] == 2 and row["out_side"] == 2

    def test_resize_handles_empty_and_null_payloads(self, spark):
        from downloader_spark.multimodal import decode_image_stub, resize_block_mean_udf

        assert decode_image_stub(b"", deterministic_fake=True).shape == (1, 1)
        df = spark.createDataFrame(
            [(1, bytearray(b"")), (2, None)], "media_id long, payload binary"
        )
        rows = {r["media_id"]: r for r in resize_block_mean_udf(df).collect()}
        for mid in (1, 2):
            assert rows[mid]["in_side"] == 1 and rows[mid]["pixel_sum"] == 0
