"""Ordering / top-k / priority operators (SURVEY §2.7).

- ``history_page``: newest-first paging — the reference's execution
  history ZREVRANGE (scheduler/storage.py:112-133) as a global top-k;
  Spark plans this as TakeOrderedAndProject (no full sort at scale).
- ``per_key_topk``: per-host priority-queue rank (reference
  http_client.py:34-39 priority seed → north rule's queue keyed by
  (host-hash, depth, score)) — window rank bounded per partition key,
  NEVER a global sort; this is what keeps 10^10-URL scheduling
  shuffle-bounded: each host's candidates hash to one partition and the
  rank is computed locally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def history_page(
    df: DataFrame, ts_col: str, limit: int, offset: int = 0, tiebreak: str | None = None
) -> DataFrame:
    """ORDER BY ts DESC LIMIT/OFFSET with a deterministic tie-break."""
    order = [F.col(ts_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    out = df.orderBy(*order)
    if offset:
        out = out.offset(offset)
    return out.limit(limit)


def per_key_topk(
    df: DataFrame,
    keys: list[str],
    order: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """row_number() ≤ k within each key group; caller supplies a total
    order (include a unique tie-break column for determinism)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
