"""Custom stateful streaming operator via ``applyInPandasWithState``.

The rebuild's stand-in for the reference's per-job progress counters
(job_manager.py:193-273 — monotonic processed/successful/failed counts
under optimistic concurrency): per-key running totals maintained in the
streaming state store, updated once per micro-batch, emitted as the
current snapshot. State survives across triggers via the checkpoint —
tested by draining a source in two AvailableNow runs and comparing the
final totals to a batch groupBy (tests/test_scheduler_streaming.py).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n_events long, sum_value double"


def _update_totals(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    # full precision lives in the STATE; rounding only at emission —
    # rounding the stored value would compound error per micro-batch
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 6)]}
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (n_events, sum_value) across ALL micro-batches."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming URL-seen filter (the crawl frontier as a stream)
# ---------------------------------------------------------------------------

SEEN_FILTER_OUTPUT = "url string, first_seen boolean"


def _passthrough_schema(stream: DataFrame, url_col: str) -> tuple[str, list[str]]:
    """Output schema = the input's columns (url first, aliased to
    'url') + first_seen — extra columns (depth, headers, ...) ride
    through the filter untouched, so a crawl pipeline doesn't lose its
    row context at the dedup step."""
    extras = [
        f for f in stream.schema.fields if f.name != url_col
    ]
    schema = "url string, " + ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in extras
    ) if extras else "url string"
    schema += ", first_seen boolean"
    return schema, [f.name for f in extras]


def streaming_seen_filter(
    url_stream: DataFrame,
    url_col: str = "url",
    num_buckets: int = 16,
    bits_per_bucket: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """Streaming first-seen detection over an unbounded URL feed — the
    batch engine's Bloom-before-anti-join (plans/bloom.py) re-expressed
    as a stateful stream: the state store holds ONE Bloom bitmap per
    ``pmod(xxhash64(url), num_buckets)`` bucket, updated per
    micro-batch. Emits (url, first_seen); ``first_seen=false`` rows are
    definite repeats within the stream's lifetime, ``true`` rows are new
    except for the usual Bloom false-positive rate being marked false
    (bound (1-e^{-kn/m})^k — size the geometry to the expected URL
    count, exactly as the batch path does). Probe positions use the
    identical double-hashing scheme, so the streaming and batch filters
    agree bit-for-bit on the same geometry.

    At scale this is the frontier-intake dedup: one state row per
    bucket (bounded memory per key), no per-URL state rows, checkpoint
    persistence across restarts for free.
    """
    import numpy as np

    from ..plans.bloom import _positions

    m, k = bits_per_bucket, num_hashes
    F_ = F

    def dedup(key, pdfs, state: GroupState):
        arr = (
            np.frombuffer(state.get[0], dtype=np.uint8).copy()
            if state.exists
            else np.zeros(m // 8, dtype=np.uint8)
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            h1 = pdf["_h1"].to_numpy(dtype=np.int64).view(np.uint64)
            h2 = pdf["_h2"].to_numpy(dtype=np.int64).view(np.uint64)
            pos = _positions(h1, h2, k, m)  # (n, k)
            byte_idx = (pos >> np.uint64(3)).astype(np.int64)
            bit_mask = (1 << (pos & np.uint64(7))).astype(np.uint8)
            # fully vectorized: probe against the state AS OF BATCH
            # START, then exact within-batch first-occurrence dedupe by
            # url (strictly fewer false positives than a sequential
            # probe-then-insert, which would let one url's inserted
            # bits shadow another new url in the same batch)
            in_state = ((arr[byte_idx] & bit_mask) != 0).all(axis=1)
            first_in_batch = ~pdf["url"].duplicated().to_numpy()
            first = first_in_batch & ~in_state
            np.bitwise_or.at(arr, byte_idx.ravel(), bit_mask.ravel())
            out = pdf[["url"] + extras].copy()
            out["first_seen"] = first
            yield out
        state.update((arr.tobytes(),))

    from ..plans.bloom import _hash_cols

    out_schema, extras = _passthrough_schema(url_stream, url_col)
    h1c, h2c = _hash_cols("url")
    keyed = (
        url_stream.withColumnRenamed(url_col, "url")
        .withColumn("_bucket", F_.pmod(F_.xxhash64("url"), F_.lit(num_buckets)).cast("int"))
        .withColumn("_h1", h1c)
        .withColumn("_h2", h2c)
    )
    return keyed.groupBy("_bucket").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType="bits binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_seen_filter_cuckoo(
    url_stream: DataFrame,
    url_col: str = "url",
    num_buckets: int = 16,
    table_rows: int = 1 << 14,
    slots_per_row: int = 4,
    max_kicks: int = 200,
) -> DataFrame:
    """Cuckoo-table variant of ``streaming_seen_filter`` (VERDICT r3
    #6: a user who picked ``seen_filter='cuckoo'`` in the batch engine
    for deletability shouldn't lose it in the streaming path). Same
    per-bucket state-store layout, same (url, first_seen) contract;
    the state is a (table, stash) cuckoo filter using the IDENTICAL
    fingerprint arithmetic as plans/cuckoo.py — a checkpointed
    streaming state row is bit-compatible with a batch-built bucket,
    and the pure-Python oracle ``cuckoo_contains_py`` probes it
    directly. Within a batch, later chunks probe the table updated by
    earlier chunks, so cross-chunk repeats are caught exactly like the
    Bloom path. Repeats are definite (no false negatives); new urls
    carry the cuckoo false-positive rate (~8/2^16 per probe at 4
    slots), the dual of the Bloom bound."""
    import numpy as np

    from ..plans.cuckoo import _fp_and_rows, _hash_cols as _cuckoo_hash_cols, _insert_all

    if table_rows & (table_rows - 1):
        raise ValueError("table_rows must be a power of two (XOR partner indexing)")

    def dedup(key, pdfs, state: GroupState):
        if state.exists:
            table_b, stash_b = state.get
            table = np.frombuffer(table_b, dtype=np.uint16).reshape(
                table_rows, slots_per_row
            ).copy()
            stash = list(np.frombuffer(stash_b, dtype=np.uint16))
        else:
            table = np.zeros((table_rows, slots_per_row), dtype=np.uint16)
            stash = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            hi = pdf["_hi"].to_numpy(dtype=np.int64).view(np.uint64)
            hf = pdf["_hf"].to_numpy(dtype=np.int64).view(np.uint64)
            fp, i1, i2 = _fp_and_rows(hi, hf, table_rows)
            in_state = (table[i1] == fp[:, None]).any(axis=1) | (
                table[i2] == fp[:, None]
            ).any(axis=1)
            if stash:
                in_state |= np.isin(fp, np.array(stash, dtype=np.uint16))
            first_in_batch = ~pdf["url"].duplicated().to_numpy()
            first = first_in_batch & ~in_state
            _insert_all(table, stash, fp[first], i1[first], table_rows, max_kicks)
            out = pdf[["url"] + extras].copy()
            out["first_seen"] = first
            yield out
        state.update(
            (table.tobytes(), np.array(sorted(stash), dtype=np.uint16).tobytes())
        )

    out_schema, extras = _passthrough_schema(url_stream, url_col)
    hic, hfc = _cuckoo_hash_cols("url")
    keyed = (
        url_stream.withColumnRenamed(url_col, "url")
        .withColumn("_bucket", F.pmod(F.xxhash64("url"), F.lit(num_buckets)).cast("int"))
        .withColumn("_hi", hic)
        .withColumn("_hf", hfc)
    )
    return keyed.groupBy("_bucket").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType="table binary, stash binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
