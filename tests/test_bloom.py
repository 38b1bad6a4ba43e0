"""Partitioned Bloom filter: no false negatives, bounded FPs, OR-merge,
and Spark-probe ≡ Python-oracle-probe."""

from downloader_spark.plans.bloom import (
    bloom_contains_py,
    bloom_maybe_seen,
    build_bloom,
    merge_blooms,
)

GEO = dict(num_buckets=8, bits_per_bucket=1 << 14, num_hashes=5)


def test_no_false_negatives_and_fp_bound(spark):
    seen_urls = [f"http://h{i % 20}.example/p/{i}" for i in range(2000)]
    other_urls = [f"http://h{i % 20}.example/q/{i}" for i in range(2000)]
    seen = spark.createDataFrame([(u,) for u in seen_urls], "url string")
    bloom = build_bloom(seen, **GEO)
    cand = spark.createDataFrame(
        [(u,) for u in seen_urls + other_urls], "url string"
    )
    probed = bloom_maybe_seen(cand, bloom, **GEO)
    rows = {r["url"]: r["maybe_seen"] for r in probed.collect()}
    # every member must probe positive
    assert all(rows[u] for u in seen_urls)
    # false positives bounded (m=16Ki bits/bucket, n≈250/bucket, k=5 → ≪1%)
    fp = sum(rows[u] for u in other_urls)
    assert fp / len(other_urls) < 0.02, fp


def test_python_probe_matches_spark(spark):
    urls = [f"http://h{i}.example/x/{i}" for i in range(500)]
    seen = spark.createDataFrame([(u,) for u in urls], "url string")
    bloom = build_bloom(seen, **GEO)
    bits = {r["bucket"]: bytes(r["bits"]) for r in bloom.collect()}
    cand = urls[:50] + [f"http://h{i}.example/y/{i}" for i in range(50)]
    cdf = spark.createDataFrame([(u,) for u in cand], "url string")
    spark_res = {
        r["url"]: r["maybe_seen"]
        for r in bloom_maybe_seen(cdf, bloom, **GEO).collect()
    }
    for u in cand:
        assert bloom_contains_py(bits, u, **GEO) == spark_res[u], u


def test_merge_is_union(spark):
    a_urls = [f"http://a.example/{i}" for i in range(300)]
    b_urls = [f"http://b.example/{i}" for i in range(300)]
    a = build_bloom(spark.createDataFrame([(u,) for u in a_urls], "url string"), **GEO)
    b = build_bloom(spark.createDataFrame([(u,) for u in b_urls], "url string"), **GEO)
    merged = merge_blooms(a, b)
    bits = {r["bucket"]: bytes(r["bits"]) for r in merged.collect()}
    for u in a_urls + b_urls:
        assert bloom_contains_py(bits, u, **GEO), u
