"""Link-graph analytics: fixed-point PageRank over a (src, dst) edge
table — the crawl-prioritization signal a frontier scheduler feeds its
priority queue (the reference has no link analysis; the recipe is the
public power-iteration PageRank, re-expressed as DataFrame joins).

Why FIXED-POINT (integer micro-units) instead of floats: float
partial-aggregation order differs between runs, partitionings, and
engines, so a float PageRank can never be value-compared against an
external oracle. With ranks in units of 1e-9 and every division an
explicit floor, addition is exactly associative — the DuckDB oracle
unrolls the same iterations in SQL and matches BIT-EXACT, and a re-run
on a different partitioning returns identical ranks (determinism the
crawl's priority ordering needs anyway).

Update rule (dangling mass dropped — the documented simple variant):
    r_0(n)     = SCALE div N
    contrib(s) = r_k(s) div outdeg(s)          per edge s→t
    r_{k+1}(t) = (15·SCALE) div (100·N)  +  (85 · Σ_s contrib) div 100

Scale shape: per iteration ONE join edges⨝ranks on src (both sides
hash-partitioned on the key; ranks is (node, long) — tiny payload) and
one hash agg on dst; per-round localCheckpoint via the tracked-id
helpers keeps the logical plan O(1) and frees superseded rounds (the
connected_keepers lesson — CLAUDE.md invariant on iterative loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _ckpt_tracked, _drop_ckpt

SCALE = 1_000_000_000


def pagerank_fixedpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """(node, rank_micro) for every node appearing as src or dst.
    ``rank_micro`` is the rank in 1e-9 units (long). ``damping_pct``
    is the damping factor in percent (integer, so the arithmetic stays
    exact)."""
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    nodes, node_ids = _ckpt_tracked(nodes)
    n = nodes.count()
    if n == 0:
        # SCALE // n below would raise a bare ZeroDivisionError (ADVICE
        # r4); fail with intent — callers that may see empty graphs
        # (e.g. a crawl before any links landed) should guard upstream
        _drop_ckpt(nodes, node_ids)
        raise ValueError("pagerank_fixedpoint: edges is empty (no nodes to rank)")
    outdeg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    outdeg, deg_ids = _ckpt_tracked(outdeg)

    base = (100 - damping_pct) * SCALE // (100 * n)
    ranks = nodes.select("node", F.lit(SCALE // n).cast("long").alias("rank_micro"))
    ranks, prev_ids = _ckpt_tracked(ranks)
    try:
        for _ in range(iters):
            contribs = (
                e.join(ranks.withColumnRenamed("node", "_s"), "_s")
                .join(outdeg, "_s")
                .select(
                    F.col("_d").alias("node"),
                    F.expr("rank_micro div _deg").alias("_c"),
                )
                .groupBy("node")
                .agg(F.sum("_c").alias("_in"))
            )
            new_ranks = (
                nodes.join(contribs, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.expr(
                            f"({damping_pct} * coalesce(_in, 0L)) div 100"
                        )
                    ).cast("long").alias("rank_micro"),
                )
            )
            new_ranks, new_ids = _ckpt_tracked(new_ranks)
            _drop_ckpt(ranks, prev_ids)
            ranks, prev_ids = new_ranks, new_ids
    finally:
        _drop_ckpt(nodes, node_ids)
        _drop_ckpt(outdeg, deg_ids)
    # the final ranks checkpoint is the caller's to free once consumed
    # (operators.dedup.release_result) — repeated calls from a crawl
    # loop would otherwise pin one checkpoint per refresh (ADVICE r4
    # class)
    ranks._ckpt_ids = prev_ids
    return ranks


def pagerank_fixedpoint_py(
    edges: set[tuple] | list[tuple],
    iters: int = 3,
    damping_pct: int = 85,
) -> dict:
    """Single-node mirror of ``pagerank_fixedpoint`` over an in-memory
    edge set — EXACTLY the same integer arithmetic (floor divisions in
    the same order), so the two produce identical rank_micro values by
    construction. Used by crawl/simulator.py when rank-informed
    frontier priority is enabled (CrawlConfig.pagerank_every) and by
    the parity tests."""
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    n = len(nodes)
    if n == 0:
        raise ValueError("pagerank_fixedpoint_py: edges is empty (no nodes to rank)")
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (100 - damping_pct) * SCALE // (100 * n)
    ranks = {u: SCALE // n for u in nodes}
    for _ in range(iters):
        contrib: dict = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + ranks[s] // outdeg[s]
        ranks = {
            u: base + (damping_pct * contrib.get(u, 0)) // 100 for u in nodes
        }
    return ranks
