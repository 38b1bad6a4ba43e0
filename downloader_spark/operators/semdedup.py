"""SemDeDup-style semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" — the public recipe: k-means cluster
the embeddings, find high-cosine pairs WITHIN each cluster only, and
keep one document per duplicate group, preferring the member farthest
from the cluster centroid). The reference repo has no counterpart; the
contract is the published recipe, same as the CCNet perplexity filter
(functions/lm.py) and the DCLM classifier (functions/classifier.py) —
this is the embedding-space dedup axis next to the token-space ones
(MinHash/SimHash/Jaccard in operators/dedup.py).

Exactness contract (what the DuckDB oracle pins): the centroids are
fitted ONCE at build time by a deterministic single-node Lloyd's
k-means (no RNG — init is the k vectors with the smallest
xxhash64(vec_id), the same rule as the distributed
similarity.kmeans_centroids) and quantized ONCE to integer MICRO-UNITS
(floor(x*1e6 + 0.5) — round-half-up, NOT Python round(), which is
banker's; CLAUDE.md invariant 8). Cluster assignment is then an EXACT
BIGINT computation — argmin over sum((v_micro - c_micro)^2) with ties
to the lowest cluster index — identical in the Spark pandas UDF and in
DuckDB list arithmetic, zero cross-engine float drift. Pair cosines
and centroid cosines are doubles rounded to 6 (the
embedding_near_dups oracle pattern).

Scale design (100 TB / 10^9 vectors): the centroid table is k×dim
integers shipped in the UDF closure (k ~ 50k in the published LAION
runs — a few MB); assignment is one Arrow-batched numpy pass over the
corpus, no shuffle. Pair generation shuffles BARE (id, cluster) keys
— vectors never enter the self-join (the minhash rule) and re-attach
by id afterwards. The within-cluster all-pairs cost is (n/k)^2 per
cluster — k is the knob the paper itself uses to bound it. Duplicate
groups resolve through the same O(log diameter) min-label components
used by the token-space dedups (operators/dedup.connected_keepers).
At this repo's oracle scale the fit runs on the fixture corpus
(functions/classifier.py DEFAULT_SEED_CORPUS pattern); at 100 TB the
fit would run distributed via similarity.kmeans_centroids(sample_frac)
and the quantized result broadcast the same way.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MICRO = 1_000_000

DEFAULT_EMB_CORPUS = os.environ.get(
    "SPARK_GRAFT_EMB_CORPUS", "/root/testdata/sf0.001/embeddings.parquet"
)


def quantize_centroids(centroids: list[list[float]]) -> list[list[int]]:
    """floor(x*1e6 + 0.5) per component — round-half-up in BOTH Python
    and SQL (floor(x + 0.5)); Python round() is banker's and would
    desync the engines (CLAUDE.md invariant 8)."""
    import math

    return [
        [int(math.floor(x * MICRO + 0.5)) for x in c] for c in centroids
    ]


def fit_semdedup_centroids(
    ids: list, vecs: list[list[float]], k: int = 8, iters: int = 4
) -> list[list[int]]:
    """Deterministic single-node Lloyd's k-means → integer micro-unit
    centroids. Init = the k vectors with the smallest
    (xxhash64(str(id)), id) — the same no-RNG rule as the distributed
    similarity.kmeans_centroids, so the two fits agree on their seed
    set. Empty clusters keep their previous centroid. All arithmetic is
    numpy float64; determinism ACROSS processes is not required — the
    fit is cached per process and BOTH the Spark literals and the
    oracle SQL derive from the same cached list (the
    functions/lm.default_lm pattern), so they agree by construction."""
    import numpy as np

    from ..functions.hashing import xxh64_str

    if not vecs:
        raise ValueError("fit_semdedup_centroids: empty input")
    V = np.asarray(vecs, dtype=np.float64)
    order = sorted(range(len(ids)), key=lambda i: (xxh64_str(str(ids[i])), ids[i]))
    k = min(k, len(vecs))
    C = V[order[:k]].copy()
    for _ in range(iters):
        d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(k):
            m = V[a == j]
            if len(m):
                C[j] = m.mean(axis=0)
    return quantize_centroids([list(c) for c in C])


_DEFAULT_CENTROIDS: list[list[int]] | None = None


def default_semdedup_centroids(k: int = 8, iters: int = 4) -> list[list[int]]:
    """Build-time centroids: fitted once per process from the fixture
    embedding corpus and cached — the Spark broadcast table and the
    generated oracle SQL both derive from this one list, so they agree
    by construction (the classifier.default_classifier pattern)."""
    global _DEFAULT_CENTROIDS
    if _DEFAULT_CENTROIDS is None:
        try:
            import pyarrow.parquet as pq

            t = pq.read_table(DEFAULT_EMB_CORPUS, columns=["vec_id", "embedding"])
            ids = t.column("vec_id").to_pylist()
            vecs = [[float(x) for x in v] for v in t.column("embedding").to_pylist()]
        except Exception as e:
            import hashlib
            import warnings

            warnings.warn(
                f"default_semdedup_centroids: could not read "
                f"{DEFAULT_EMB_CORPUS} ({e!r}); fitting on hash-derived "
                "synthetic vectors — clusters will NOT reflect the corpus",
                RuntimeWarning,
                stacklevel=2,
            )
            ids = list(range(64))
            vecs = [
                [
                    (int(hashlib.md5(f"sd{i}.{j}".encode()).hexdigest()[:8], 16)
                     / 2**31) - 1.0
                    for j in range(64)
                ]
                for i in ids
            ]
        _DEFAULT_CENTROIDS = fit_semdedup_centroids(ids, vecs, k=k, iters=iters)
    return _DEFAULT_CENTROIDS


def assign_py(vec_micro: list[int], centroids_micro: list[list[int]]) -> int:
    """Python mirror of the Spark/SQL assignment: exact integer argmin,
    ties to the lowest cluster index — the parity oracle for tests."""
    best, best_d = 0, None
    for j, c in enumerate(centroids_micro):
        d = sum((a - b) * (a - b) for a, b in zip(vec_micro, c))
        if best_d is None or d < best_d:
            best, best_d = j, d
    return best


def micro_col(vec):
    """array<double> → array<bigint> micro-units, floor(x*1e6 + 0.5)
    (native, whole-stage-codegen)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * MICRO + F.lit(0.5)).cast("long")
    )


def make_nearest_centroid_exact_udf(centroids_micro: list[list[int]]):
    """Arrow-batched pandas UDF: array<bigint> micro vector → nearest
    centroid index by EXACT int64 squared L2 (sums are
    order-independent in integer arithmetic, so numpy here, DuckDB
    list_sum there, and the Python mirror all agree bit-for-bit;
    np.argmin ties to the first = lowest index, matching assign_py and
    the SQL ORDER BY d, cl). Max magnitude: diff ≤ ~2^22 micro for
    unit-scale embeddings → dim·diff² ≤ ~2^50 — comfortably int64.
    The k×dim int closure ships once per task like a broadcast; each
    batch is one vectorized subtract-square-sum (k·dim·batch ints —
    for k in the tens of thousands switch to the |m|²−2m·C+|c|²
    matmul expansion, still exact in int64)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    C = np.asarray(centroids_micro, dtype=np.int64)  # k × dim

    @pandas_udf(IntegerType())
    def nearest(vm: pd.Series) -> pd.Series:
        if len(vm) == 0:
            return pd.Series([], dtype="int32")
        M = np.stack([np.asarray(x, dtype=np.int64) for x in vm])
        d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return nearest


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _spark_round(x: float, round_to: int) -> float:
    """Spark Round(DoubleType, n): BigDecimal.valueOf (shortest repr) →
    setScale(n, HALF_UP) → double (the repetition_arrow._round6 mirror,
    scale-parameterised)."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-round_to)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _make_cluster_edges_fn(threshold: float, round_to: int, block: int = 2048):
    """applyInPandas kernel: one cluster's (_id, _v) rows in → the
    (id_a, id_b) pairs with round(cosine, round_to) >= threshold out
    (id_a < id_b), replacing the old within-cluster self-join + two
    vector re-attach joins + HOF cosine over every pair (r7; guide
    §2.3/§4.2 — the pair table existed only to be thresholded).

    Exactness: dot/norm use the same elementwise per-dimension
    accumulation as the F.aggregate folds they replace (single IEEE
    mul + add per step — bit-identical; see similarity.py's kernel
    block). The threshold test is on the ROUNDED cosine; raw scores
    farther than 1e-9 from the decision boundary
    (threshold − 0.5·quantum) decide directly, the (empirically empty)
    boundary band goes through the exact _spark_round mirror."""
    import numpy as np

    quantum = 10.0 ** (-round_to)
    cut = threshold - 0.5 * quantum
    band = 1e-9

    def _fold_norm(V):
        nsq = np.zeros(V.shape[0], dtype=np.float64)
        for d in range(V.shape[1]):
            c = V[:, d]
            nsq = nsq + c * c
        return np.sqrt(nsq)

    def _emit(ids_a, ids_b, V_a, V_b, nrm_a, nrm_b, pair_mask, out_a, out_b):
        """Score every (A-row × B-row) pair with the exact fold, keep
        those passing the rounded-threshold test AND ``pair_mask``."""
        acc = np.zeros((V_a.shape[0], V_b.shape[0]), dtype=np.float64)
        for d in range(V_a.shape[1]):
            acc = acc + V_a[:, d][:, None] * V_b[:, d][None, :]
        sims = acc / (nrm_a[:, None] * nrm_b[None, :])
        hit = pair_mask & (sims >= cut - band)
        ii, jj = np.nonzero(hit)
        if len(ii):
            s = sims[ii, jj]
            sure = s >= cut + band
            for t in np.nonzero(~sure)[0]:
                sure[t] = _spark_round(float(s[t]), round_to) >= threshold
            ii, jj = ii[sure], jj[sure]
            if len(ii):
                a, b = ids_a[ii], ids_b[jj]
                out_a.append(np.minimum(a, b))
                out_b.append(np.maximum(a, b))

    def edges_fn(pdf: pd.DataFrame, ta: int = 0, tb: int = 0) -> pd.DataFrame:
        """One (cluster, block-pair) task: rows carry ``_blk`` ∈ {ta,
        tb}; within-block (ta == tb) pairs use the strict id upper
        triangle, cross-block pairs score every A×B combination once
        and emit (min id, max id) — the same pair set and arithmetic
        as the single-task form, split for parallelism."""
        empty = pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        if len(pdf) < 2:
            return empty
        blk = (
            pdf["_blk"].to_numpy()
            if "_blk" in pdf.columns
            else np.zeros(len(pdf), dtype=np.int64)
        )
        ids = pdf["_id"].to_numpy()
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        out_a, out_b = [], []
        if ta == tb:
            order = np.argsort(ids, kind="stable")
            ids, V = ids[order], V[order]
            n = V.shape[0]
            nrm = _fold_norm(V)
            for i0 in range(0, n, block):
                for j0 in range(i0, n, block):
                    ia = np.arange(i0, min(i0 + block, n))
                    jb = np.arange(j0, min(j0 + block, n))
                    _emit(
                        ids[ia], ids[jb], V[ia], V[jb],
                        nrm[ia], nrm[jb],
                        ia[:, None] < jb[None, :], out_a, out_b,
                    )
        else:
            ma, mb = blk == ta, blk == tb
            if not ma.any() or not mb.any():
                return empty
            Va, Vb = V[ma], V[mb]
            na, nb_ = _fold_norm(Va), _fold_norm(Vb)
            ia_all, jb_all = ids[ma], ids[mb]
            for i0 in range(0, Va.shape[0], block):
                for j0 in range(0, Vb.shape[0], block):
                    sa, sb = slice(i0, i0 + block), slice(j0, j0 + block)
                    _emit(
                        ia_all[sa], jb_all[sb], Va[sa], Vb[sb],
                        na[sa], nb_[sb],
                        np.ones((len(ia_all[sa]), len(jb_all[sb])), dtype=bool),
                        out_a, out_b,
                    )
        if not out_a:
            return empty
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    return edges_fn


def semantic_dedup(
    spark: SparkSession,
    embeddings: DataFrame,
    centroids_micro: list[list[int]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """SemDeDup decision table: (vec_id, cluster, component,
    cos_centroid, keep) for every input vector.

    - ``cluster``: exact-integer nearest centroid (see the module
      docstring's exactness contract).
    - ``component``: min vec_id reachable through within-cluster
      cosine-≥-threshold edges (connected_keepers min-label
      propagation); singletons label themselves.
    - ``keep``: True for exactly one member per component — the one
      with the LOWEST cosine to its cluster centroid (the paper's
      keep-the-outlier rule: extreme points carry more signal), ties
      to the lowest vec_id.

    Plan shape: one pandas-UDF assignment pass (no shuffle) → bare
    (id, cluster) self-join keyed on cluster (vectors re-attach by id
    after pairing — the minhash rule) → O(log diameter) component
    rounds → one window per component for the keeper pick. The
    assigned frame is referenced four times downstream (centroid
    cosine, both pair sides, final join-back), so it is materialized
    ONCE via a tracked localCheckpoint — without it the assignment
    UDF re-runs per reference (plan-audited: 4 ArrowEvalPython nodes
    → 1). The returned frame carries ``_ckpt_ids`` for
    operators.dedup.release_result (the house pattern).
    """
    from .dedup import _ckpt_tracked, connected_keepers

    base = embeddings.select(
        F.col(id_col).alias("_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("_v"),
    )
    nearest = make_nearest_centroid_exact_udf(centroids_micro)
    asg, asg_ids = _ckpt_tracked(
        base.withColumn("cluster", nearest(micro_col(F.col("_v"))))
    )

    # centroid doubles for the cosine-to-centroid column: EXACTLY
    # m / 1e6 in both engines (IEEE double division of the same ints)
    cent_rows = [
        (j, [m / MICRO for m in c]) for j, c in enumerate(centroids_micro)
    ]
    cent = spark.createDataFrame(
        cent_rows, "cluster int, _c array<double>"
    )
    asg = asg.join(F.broadcast(cent), "cluster").withColumn(
        "cos_centroid",
        F.round(
            _dot(F.col("_v"), F.col("_c"))
            / (_norm(F.col("_v")) * _norm(F.col("_c"))),
            round_to,
        ),
    ).drop("_c")

    # within-cluster edges via the Arrow kernel (r7): each cluster's
    # rows group to one task and all pairs are scored/thresholded in
    # numpy with the bit-exact fold order — the old bare-id self-join,
    # the two vector re-attach joins and the HOF cosine over every
    # pair are gone (at sf1.0 that pair table was ~26M rows, each
    # carrying two 64-double arrays through two joins).
    from pyspark.sql.types import StructField, StructType

    id_type = asg.schema["_id"].dataType
    edge_schema = StructType(
        [StructField("id_a", id_type), StructField("id_b", id_type)]
    )
    edges_fn = _make_cluster_edges_fn(threshold, round_to)
    # block-pair parallelism (r7): one task per cluster capped the
    # kernel at k-way parallelism (k=8 on a 32-core host → 3/4 idle).
    # Rows are hash-assigned to nb deterministic blocks and replicated
    # to every (block, block) task they participate in — k·nb(nb+1)/2
    # tasks, same pair set, same per-pair arithmetic. nb is derived
    # from the session parallelism (not a magic constant); nb=1
    # degenerates to the per-cluster form.
    k = max(len(centroids_micro), 1)
    par = spark.sparkContext.defaultParallelism
    nb = 1
    while k * nb * (nb + 1) // 2 < par and nb < 8:
        nb += 1
    tasks = asg.select(
        "cluster", "_id", "_v",
        F.pmod(F.xxhash64(F.col("_id").cast("string")), F.lit(nb))
        .cast("int").alias("_blk"),
    ).select(
        "cluster", "_id", "_v", "_blk",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(nb - 1)),
                lambda x: F.struct(
                    F.least(F.col("_blk"), x.cast("int")).alias("ta"),
                    F.greatest(F.col("_blk"), x.cast("int")).alias("tb"),
                ),
            )
        ).alias("_t"),
    ).select("cluster", "_id", "_v", "_blk", "_t.ta", "_t.tb")
    edges = (
        tasks.groupBy("cluster", "ta", "tb")
        .applyInPandas(
            lambda key, pdf: edges_fn(pdf, int(key[1]), int(key[2])),
            edge_schema,
        )
    )

    comp = connected_keepers(edges).select(
        F.col("node").alias("_id"), F.col("keeper").alias("component")
    )
    full = asg.join(comp, "_id", "left").withColumn(
        "component", F.coalesce("component", F.col("_id"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("component").orderBy(
        F.asc("cos_centroid"), F.asc("_id")
    )
    out = full.select(
        F.col("_id").alias(id_col),
        "cluster",
        "component",
        "cos_centroid",
        (F.row_number().over(w) == 1).alias("keep"),
    )
    out._ckpt_ids = asg_ids
    return out


def centroids_sql_values(centroids_micro: list[list[int]]) -> str:
    """The centroid table as DuckDB VALUES rows of BIGINT lists:
    ``(0, [..]), (1, [..])`` — splice into a ``cent(cl, cm)`` CTE."""
    rows = []
    for j, c in enumerate(centroids_micro):
        lits = ", ".join(str(int(m)) for m in c)
        rows.append(f"({j}, [{lits}]::BIGINT[])")
    return ", ".join(rows)
