"""Byte-identical parity: single-node oracle ↔ Spark extract_udf.

This is the north-rule invariant (BASELINE.json input_hint:
"byte-identical extracted text per url").
"""

from pyspark.sql import functions as F

from downloader_spark.htmlx import convert_content, detect_render_flags, extract_page
from downloader_spark.functions.udfs import extract_udf

from corpus import CORPUS


def test_extract_page_matches_convert_content():
    """extract_page's one-parse fast path == reference-faithful two-call path."""
    for name, (content, ctype) in CORPUS.items():
        r = extract_page(content, ctype, f"http://t/{name}")
        assert r.text == convert_content(content, ctype, "text"), name
        assert r.markdown == convert_content(content, ctype, "markdown"), name


def test_detection_flags_sane():
    flags = detect_render_flags("http://t/react", *CORPUS["react_shell"])
    assert flags.needs_js_render  # framework marker + tiny body (D2)
    assert not flags.needs_render  # body text below threshold (D1)

    flags = detect_render_flags("http://t/js", *CORPUS["js_required"])
    assert flags.needs_js_render  # explicit "enable javascript" phrase

    flags = detect_render_flags("http://t/static", *CORPUS["static_complete"])
    assert not flags.needs_js_render  # substantial body + og: metadata
    assert flags.needs_render  # D1: has content container

    # domain list fires BEFORE the static check (content_converter.py:267-278)
    flags = detect_render_flags("http://x.substack.com/p/1", *CORPUS["static_complete"])
    assert flags.needs_js_render is True

    flags = detect_render_flags("http://t/err", *CORPUS["error_page"])
    assert flags.is_error_page and not flags.needs_render

    flags = detect_render_flags("http://t/txt", *CORPUS["not_html"])
    assert not flags.needs_render and not flags.needs_js_render


def test_detection_flags_reference_fixture_families():
    """Ported contracts for the r2-added fixture shapes
    (reference html_fixtures.py:68-283 expectations)."""
    # framework marker (ng-app) + tiny body → JS render
    flags = detect_render_flags("http://t/ng", *CORPUS["angular_shell"])
    assert flags.needs_js_render and not flags.needs_render

    # SSR loading shell: empty #root, missing metadata, tiny body
    flags = detect_render_flags("http://t/ssr", *CORPUS["ssr_loading_shell"])
    assert flags.needs_js_render

    # medium-like loading root on a JS-heavy domain
    flags = detect_render_flags(
        "http://medium.com/@a/post", *CORPUS["loading_root_shell"]
    )
    assert flags.needs_js_render

    # rendered newsletter page: #root BUT complete og/twitter metadata
    # + article — the framework marker alone must not force a re-render
    # on a non-JS-heavy domain with substantial content
    flags = detect_render_flags(
        "http://example.com/p/waves", *CORPUS["newsletter_rendered"]
    )
    assert flags.has_content_container

    # >50KB with complete metadata: size threshold keeps it static
    content, ctype = CORPUS["large_article_50kb"]
    assert len(content) > 50_000  # the fixture's defining property
    flags = detect_render_flags("http://t/large", content, ctype)
    assert not flags.needs_js_render and flags.needs_render


def test_spark_udf_byte_identical_to_oracle(spark):
    rows = [
        (f"http://host{i % 7}.example/{name}", content, ctype)
        for i, (name, (content, ctype)) in enumerate(CORPUS.items())
    ]
    df = spark.createDataFrame(rows, "url string, html binary, content_type string")
    out = (
        df.withColumn("ex", extract_udf("url", "html", "content_type"))
        .select("url", "html", "content_type", "ex.*")
        .collect()
    )
    assert len(out) == len(rows)
    for r in out:
        oracle = extract_page(bytes(r["html"]), r["content_type"], r["url"])
        assert r["text"] == oracle.text, r["url"]
        assert r["markdown"] == oracle.markdown, r["url"]
        assert r["needs_render"] == oracle.flags.needs_render
        assert r["needs_js_render"] == oracle.flags.needs_js_render
        assert r["body_text_len"] == oracle.flags.body_text_len


def test_spark_udf_on_generated_pages(spark):
    """Full-path check over the web-graph generator at small scale."""
    from downloader_spark.sources.pagegen import generate_web_graph

    pages = generate_web_graph(spark, n_hosts=6, pages_per_host=8, seed=7)
    out = (
        pages.withColumn("ex", extract_udf("url", "html", "content_type"))
        .select("url", "html", "content_type", "text", F.col("ex.text").alias("udf_text"))
        .collect()
    )
    assert len(out) > 20
    for r in out:
        oracle = extract_page(bytes(r["html"]), r["content_type"], r["url"]).text
        assert r["udf_text"] == oracle, r["url"]
        # generator stored text == oracle text by construction
        assert r["text"] == oracle, r["url"]
