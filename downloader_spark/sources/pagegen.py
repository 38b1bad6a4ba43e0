"""Deterministic synthetic Common-Crawl-style pages.

Two generators, both fully distributed (``spark.range`` →
``mapInPandas``; no driver-side loops, rows materialize on executors):

1. ``pages_from_documents`` — wraps the driver-provided ``documents``
   table's text into seeded HTML templates, yielding the
   BASELINE.json input_hint schema
   ``pages(url, warc_ts, html, text, lang)``. Used by the flagship
   query / driver correctness / bench so all inputs trace back to
   /root/testdata (per instructions: don't synthesize your own test
   inputs where driver tables exist).

2. ``generate_web_graph`` — a parameterized linked web (hosts with
   Zipf-skewed page counts, in-site + cross-site links, per-host
   robots.txt with Crawl-delay) for the crawl-wave engine. Page
   *content* is a pure function of (seed, url), so any scale factor
   reproduces byte-identically — the property the resume/parity tests
   rely on.

HTML templates intentionally exercise every branch of the reference's
conversion path (content_converter.py:441-523): container cascade hits
(article/main/.content), body-fallback, JS-shell pages (#root + tiny
body → D2 fires), "enable javascript" placeholders, non-HTML rows, and
empty bodies.
"""

from __future__ import annotations

import random
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..htmlx.convert import extract_page

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_WORDS = {
    "en": (
        "the data web crawl spark engine page text word link host fetch index "
        "scale shuffle partition token stream batch wave frontier seed robot "
        "delay budget rank depth score hash filter bloom snapshot commit"
    ).split(),
    "de": (
        "die daten netz seite text wort verbindung rechner abruf index "
        "skala partition strom welle grenze samen roboter haushalt rang tiefe"
    ).split(),
    "fr": (
        "les données toile page texte mot lien hôte récupération index "
        "échelle partition flux vague frontière graine robot budget rang"
    ).split(),
    "es": (
        "los datos red página texto palabra enlace anfitrión búsqueda índice "
        "escala partición flujo ola frontera semilla robot presupuesto rango"
    ).split(),
}
_LANGS = sorted(_WORDS)


def _sentence(rng: random.Random, lang: str, n: int) -> str:
    words = _WORDS[lang]
    return " ".join(rng.choice(words) for _ in range(n)).capitalize() + "."


def _paragraph(rng: random.Random, lang: str) -> str:
    return " ".join(_sentence(rng, lang, rng.randint(6, 14)) for _ in range(rng.randint(2, 5)))


def _render_article(rng: random.Random, lang: str, title: str, links: list[str]) -> str:
    """Realistic article page: clutter (nav/footer/script/style) around a
    content container chosen from the reference cascade."""
    container = rng.choice(
        ["article", "main", 'div role="main"', 'div class="content"',
         'div class="post-content"', 'div class="entry-content"', "body-only"]
    )
    paras = "".join(f"<p>{_paragraph(rng, lang)}</p>" for _ in range(rng.randint(2, 6)))
    heading = f"<h1>{title}</h1>"
    items = "".join(f"<li>{_sentence(rng, lang, 4)}</li>" for _ in range(rng.randint(0, 4)))
    lst = f"<ul>{items}</ul>" if items else ""
    anchor_html = "".join(
        f'<p>See <a href="{href}">{_sentence(rng, lang, 2)[:-1]}</a> next.</p>'
        for href in links
    )
    meta = (
        f'<meta property="og:title" content="{title}">'
        f'<meta property="og:description" content="{_sentence(rng, lang, 8)}">'
    )
    body_core = heading + paras + lst + anchor_html
    if container == "body-only":
        inner = body_core
    else:
        tag = container.split(" ", 1)[0]
        attrs = container[len(tag):]
        inner = f"<{tag}{attrs}>{body_core}</{tag}>"
    return (
        f"<html><head><title>{title}</title>{meta}"
        f"<style>.x{{color:red}}</style><script>var t=1;</script></head>"
        f"<body><nav>site nav</nav><header>site header</header>"
        f"{inner}"
        f"<aside>ads</aside><footer>copyright</footer></body></html>"
    )


def _render_js_shell(rng: random.Random, title: str) -> str:
    """React/Vue shell: framework marker + tiny body → D2 fires."""
    marker = rng.choice(['<div id="root"></div>', '<div id="app"></div>'])
    return (
        f"<html><head><title>{title}</title></head>"
        f"<body>{marker}<script src=\"/bundle.js\"></script></body></html>"
    )


def _render_js_required(title: str) -> str:
    return (
        f"<html><head><title>{title}</title></head>"
        f"<body><p>Please enable JavaScript to view {title}.</p></body></html>"
    )


def _render_wrapped_document(doc_text: str, title: str, rng: random.Random) -> str:
    """Wrap an existing document's text into paragraphs inside a container."""
    frags = [doc_text[i : i + 240] for i in range(0, len(doc_text), 240)] or [""]
    paras = "".join(f"<p>{_esc(fr)}</p>" for fr in frags)
    container = rng.choice(["article", "main", 'div class="content"'])
    tag = container.split(" ", 1)[0]
    attrs = container[len(tag):]
    meta = f'<meta property="og:title" content="{_esc(title)}">'
    return (
        f"<html><head><title>{_esc(title)}</title>{meta}<script>x()</script></head>"
        f"<body><nav>nav bar</nav>"
        f"<{tag}{attrs}><h1>{_esc(title)}</h1>{paras}</{tag}>"
        f"<footer>footer text</footer></body></html>"
    )


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


_BASE_TS = int(datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp())


def pages_from_documents(
    spark: SparkSession, sf_dir: str, seed: int = 42
) -> DataFrame:
    """documents.parquet → pages(url, warc_ts, html, text, lang).

    ``text`` carries the ORIGINAL document text (the WET analog);
    ``html`` is the seeded wrapping. url is keyed on doc_id and spread
    over hosts derived from ``source`` — deterministic for a given seed.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, text, lang, source in zip(
                pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
            ):
                rng = random.Random((seed << 32) ^ int(doc_id))
                host = f"{source}{int(doc_id) % 97}.example"
                url = f"http://{host}/doc/{int(doc_id)}"
                title = f"Document {int(doc_id)}"
                html = _render_wrapped_document(text or "", title, rng)
                ts = datetime.fromtimestamp(
                    _BASE_TS + (int(doc_id) * 37) % 86400, tz=timezone.utc
                )
                rows.append(
                    (url, ts, html.encode("utf-8"), text, lang)
                )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return docs.select("doc_id", "text", "lang", "source").mapInPandas(
        gen, schema=PAGES_SCHEMA
    )


def generate_web_graph(
    spark: SparkSession,
    n_hosts: int = 50,
    pages_per_host: int = 40,
    seed: int = 42,
    skew: float = 1.2,
    partitions: int | None = None,
) -> DataFrame:
    """Linked synthetic web with per-host robots.txt.

    Host h gets ``max(1, int(pages_per_host * (h+1)^-skew * n_hosts /
    H_norm))`` pages — Zipf-ish so host 0 is hot (exercises salting/AQE
    skew handling). Page content/links are pure functions of
    (seed, host_id, page_id).
    """
    # per-host page counts (cheap closed form, computed identically on
    # executors — no driver materialization of the page list)
    weights = [(h + 1) ** (-skew) for h in range(n_hosts)]
    norm = sum(weights) / n_hosts
    counts = [max(1, int(round(pages_per_host * w / norm))) for w in weights]
    offsets = [0]
    for c in counts:
        offsets.append(offsets[-1] + c)
    total = offsets[-1]

    bcounts = spark.sparkContext.broadcast((counts, offsets))

    def gen(batches):
        counts_, offsets_ = bcounts.value

        def host_of(gid: int) -> tuple[int, int]:
            # binary search host for global page id
            lo, hi = 0, len(counts_) - 1
            while lo < hi:
                mid = (lo + hi + 1) // 2
                if offsets_[mid] <= gid:
                    lo = mid
                else:
                    hi = mid - 1
            return lo, gid - offsets_[lo]

        for pdf in batches:
            rows = []
            for gid in pdf["id"]:
                gid = int(gid)
                h, p = host_of(gid)
                host = f"site{h:04d}.example"
                rng = random.Random((seed << 34) ^ (h << 20) ^ p)
                lang = _LANGS[rng.randrange(len(_LANGS))]
                url = f"http://{host}/p/{p}"
                title = f"Page {p} of {host}"
                # deterministic out-links: mostly in-site, some cross-site
                n_links = rng.randint(1, 5)
                links = []
                for _ in range(n_links):
                    if rng.random() < 0.8:
                        tgt_p = rng.randrange(counts_[h])
                        links.append(f"http://{host}/p/{tgt_p}")
                    else:
                        th = rng.randrange(len(counts_))
                        tp = rng.randrange(counts_[th])
                        links.append(f"http://site{th:04d}.example/p/{tp}")
                kind = rng.random()
                if kind < 0.80:
                    html = _render_article(rng, lang, title, links)
                    ctype = "text/html"
                elif kind < 0.88:
                    html = _render_js_shell(rng, title)
                    ctype = "text/html"
                elif kind < 0.92:
                    html = _render_js_required(title)
                    ctype = "text/html"
                elif kind < 0.97:
                    html = _paragraph(rng, lang)  # plain text asset
                    ctype = "text/plain"
                else:
                    html = "<html><body></body></html>"  # empty page
                    ctype = "text/html"
                text = extract_page(html.encode("utf-8"), ctype).text
                ts = datetime.fromtimestamp(
                    _BASE_TS + (gid * 13) % 86400, tz=timezone.utc
                )
                rows.append((url, ts, html.encode("utf-8"), text, lang, ctype))
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "html", "text", "lang", "content_type"],
            )

    n_part = partitions or max(8, total // 2000)
    pages = (
        spark.range(0, total, numPartitions=n_part)
        .mapInPandas(gen, schema=PAGES_SCHEMA + ", content_type string")
    )
    robots = generate_robots(spark, n_hosts, seed)
    return pages.unionByName(robots)


def generate_robots(spark: SparkSession, n_hosts: int, seed: int = 42) -> DataFrame:
    """Per-host robots.txt rows, stored as ordinary pages under
    ``http://<host>/robots.txt`` (SURVEY §7: robots built by the same
    fetch machinery). ~20% of hosts have none (default-allow)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for h in pdf["id"]:
                h = int(h)
                rng = random.Random((seed << 36) ^ h)
                if rng.random() < 0.2:
                    continue  # host without robots.txt
                host = f"site{h:04d}.example"
                delay = rng.choice([0, 0, 1, 2, 5])
                lines = ["User-agent: *"]
                if rng.random() < 0.4:
                    lines.append(f"Disallow: /private{rng.randrange(3)}/")
                if delay:
                    lines.append(f"Crawl-delay: {delay}")
                body = "\n".join(lines) + "\n"
                ts = datetime.fromtimestamp(_BASE_TS, tz=timezone.utc)
                rows.append(
                    (
                        f"http://{host}/robots.txt",
                        ts,
                        body.encode("utf-8"),
                        body,
                        "en",
                        "text/plain",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "html", "text", "lang", "content_type"],
            )

    return spark.range(0, n_hosts, numPartitions=max(1, n_hosts // 50)).mapInPandas(
        gen, schema=PAGES_SCHEMA + ", content_type string"
    )
