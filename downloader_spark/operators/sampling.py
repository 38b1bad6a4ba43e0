"""Deterministic corpus sampling / source mixing.

Training-data pipelines don't random()-sample — they HASH-sample, so
the same corpus + the same weights always yields the same mixture
(reproducible ablations, resumable jobs, and no coordination between
executors). This module implements the standard recipe: a document is
kept iff the first 8 hex chars of md5(id:source:salt) fall under the
per-source threshold. md5 (not xxhash64) on purpose: the decision is
auditable from ANY engine — the DuckDB oracle recomputes membership
exactly, and so could a user's warehouse.

Scale shape: pure per-row native expressions (one md5 + one string
compare), no shuffle, no state; the filter pushes into the scan
pipeline and a 100 TB mixture materializes at read speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8


def _threshold_hex(rate: float) -> str:
    """rate ∈ [0,1] → 8-hex-digit threshold; compare LEXICOGRAPHICALLY
    against the md5 prefix (equal-length lowercase hex compares like
    the number it encodes)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return f"{min(int(rate * _HEX_SPACE), _HEX_SPACE - 1):08x}"


def sample_key(id_col: Column, source_col: Column, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat_ws(":", id_col.cast("string"), source_col, F.lit(salt))),
        1, 8,
    )


def source_mix_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Keep each row with its source's probability, deterministically.
    ``rates`` maps source → keep fraction; unlisted sources use
    ``default_rate``; rate 1.0 keeps everything (no hash edge-case at
    the top of the range). Returns the input rows + ``sample_key`` so
    the decision is auditable downstream."""
    key = sample_key(F.col(id_col), F.col(source_col), salt)
    thresh = F.lit(_threshold_hex(default_rate))
    keep_all = F.lit(default_rate >= 1.0)
    for src, rate in sorted(rates.items()):
        cond = F.col(source_col) == src
        thresh = F.when(cond, F.lit(_threshold_hex(rate))).otherwise(thresh)
        keep_all = F.when(cond, F.lit(rate >= 1.0)).otherwise(keep_all)
    return df.withColumn("sample_key", key).filter(
        keep_all | (F.col("sample_key") < thresh)
    )
