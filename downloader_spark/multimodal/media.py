"""Multimodal payloads as opaque binary columns + typed metadata.

Image/audio/video bytes are carried as ``binary`` columns with a fixed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched functions over ``mapInPandas``. The actual codec step
is STUBBED (no image/audio libraries in this container): decode raises
``NotImplementedError`` unless ``deterministic_fake=True``, in which
case a seeded byte-statistics "decode" stands in — the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested either
way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image|audio|video
        StructField("codec", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),  # exact — oracle-recomputable
        StructField("byte_mean", DoubleType()),
        StructField("byte_entropy", DoubleType()),
        StructField("histogram", ArrayType(LongType())),  # 16 coarse bins
    ]
)


def decode_image_stub(payload: bytes, deterministic_fake: bool = False):
    """Codec boundary. Real decode needs PIL/libjpeg — unavailable here.

    With ``deterministic_fake`` the function returns byte-statistics
    pseudo-pixels so downstream plumbing can be exercised end-to-end.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires an image library not present in this "
            "runtime; pass deterministic_fake=True for plumbing tests"
        )
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    if not len(arr):  # empty/null payload → 1×1 zero pixel, not a crash
        return np.zeros((1, 1), dtype=np.uint8)
    side = max(1, int(len(arr) ** 0.5))
    return arr[: side * side].reshape(side, side)


def media_features_udf(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched byte-level features (no codec needed): size, mean,
    entropy, 16-bin histogram. The real decode would slot into the same
    mapInPandas body."""
    import numpy as np

    passthrough = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = StructType(passthrough + list(FEATURES_SCHEMA.fields))
    keep = [f.name for f in passthrough]

    def gen(batches):
        for pdf in batches:
            feats = {
                "n_bytes": [], "byte_sum": [], "byte_mean": [],
                "byte_entropy": [], "histogram": [],
            }
            for blob in pdf[payload_col]:
                arr = np.frombuffer(bytes(blob) if blob is not None else b"", dtype=np.uint8)
                n = len(arr)
                feats["n_bytes"].append(n)
                feats["byte_sum"].append(int(arr.sum()) if n else 0)
                feats["byte_mean"].append(round(float(arr.mean()), 6) if n else 0.0)
                hist = np.bincount(arr >> 4, minlength=16).astype("int64") if n else np.zeros(16, "int64")
                p = hist / max(n, 1)
                ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum()) if n else 0.0
                feats["byte_entropy"].append(round(ent, 6))
                feats["histogram"].append(hist.tolist())
            out = pdf[keep].copy()
            for k, v in feats.items():
                out[k] = v
            yield out

    return df.mapInPandas(gen, schema=out_schema)


def sample_frames_plan(
    df: DataFrame,
    every_ms: int = 1000,
    duration_col: str = "meta.duration_ms",
) -> DataFrame:
    """Frame-sampling PLAN: one row per sampled timestamp (the decode of
    each frame is the stubbed codec step). Native explode of a sequence
    — demonstrates the row-explosion shape video processing needs."""
    return df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_col) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("in_side", IntegerType()),
        StructField("out_side", IntegerType()),
        StructField("pixel_sum", LongType()),
        StructField("pixel_digest", StringType()),  # md5 of the resized bytes
    ]
)


def resize_block_mean_udf(
    df: DataFrame,
    payload_col: str = "payload",
    out_side: int = 8,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Resize step of the multimodal pipeline: decode (stub) → square
    pixel matrix → block-MEAN downsample to ``out_side``² with exact
    integer semantics (floor of each block mean — reproducible on any
    platform, unlike float interpolation). A real image library slots
    into the same mapInPandas body at the decode call. Emits the
    resized matrix's sum + md5 digest rather than the pixels (the
    contract a test or dedup-by-thumbnail pipeline needs), plus the
    passthrough columns."""
    import hashlib

    import numpy as np

    passthrough = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = StructType(passthrough + list(RESIZE_SCHEMA.fields))
    keep = [f.name for f in passthrough]

    def gen(batches):
        for pdf in batches:
            cols = {"in_side": [], "out_side": [], "pixel_sum": [], "pixel_digest": []}
            for blob in pdf[payload_col]:
                img = decode_image_stub(
                    bytes(blob) if blob is not None else b"",
                    deterministic_fake=deterministic_fake,
                )
                side = img.shape[0]
                k = min(out_side, side)
                bounds = (np.arange(k + 1) * side) // k
                small = np.empty((k, k), dtype=np.int64)
                for i in range(k):
                    for j in range(k):
                        block = img[bounds[i]:bounds[i + 1], bounds[j]:bounds[j + 1]]
                        small[i, j] = int(block.sum()) // block.size
                cols["in_side"].append(side)
                cols["out_side"].append(k)
                cols["pixel_sum"].append(int(small.sum()))
                cols["pixel_digest"].append(
                    hashlib.md5(small.astype(np.uint8).tobytes()).hexdigest()
                )
            out = pdf[keep].copy()
            for name, vals in cols.items():
                out[name] = vals
            yield out

    return df.mapInPandas(gen, schema=out_schema)


def synth_media_from_embeddings(spark, sf_dir: str) -> DataFrame:
    """Deterministic fake media rows derived from the embeddings table:
    payload = UTF-8 bytes of the comma-joined INTEGER-quantized vector
    (floor(x·1000) — floor, not cast, because engines disagree on
    float→int rounding, and integer→string formatting is identical
    everywhere while float→string is not), so an external engine
    (DuckDB) can rebuild the exact same bytes and recompute the byte
    features as a hard oracle; metadata typed per vec_id."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mtype = (
        F.when(F.col("vec_id") % 3 == 0, "image")
        .when(F.col("vec_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        mtype.alias("media_type"),
        F.lit("fake").alias("codec"),
        (F.col("vec_id") % 640 + 16).cast("int").alias("width"),
        (F.col("vec_id") % 480 + 16).cast("int").alias("height"),
        (F.col("vec_id") % 9000 + 1000).cast("long").alias("duration_ms"),
    )
    payload = F.encode(
        F.concat_ws(
            ",",
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * 1000).cast("string"),
            ),
        ),
        "UTF-8",
    )
    return emb.select(
        F.col("vec_id").alias("media_id"),
        payload.alias("payload"),
        meta.alias("meta"),
    )
