"""Property-based hardening of the extraction path (hypothesis).

The crawl engine feeds arbitrary web bytes through extract_page inside
executor Python workers — a crash there kills a 10^10-row stage, so the
invariant is: NEVER raise, always deterministic, whitespace contract
holds.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from downloader_spark.functions.urlnorm import canonicalize_url, validate_url
from downloader_spark.htmlx import extract_page, html_to_markdown, html_to_plaintext

_fuzz = settings(
    max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

tag_soup = st.text(
    alphabet=st.sampled_from(list("<>/ab cdiv=\"'&#;\n\tp!-")), max_size=400
)


@given(data=st.binary(max_size=1000))
@_fuzz
def test_extract_never_raises_on_bytes(data):
    r = extract_page(data, "text/html", "http://x.example/", with_links=True)
    assert isinstance(r.text, str) and isinstance(r.markdown, str)
    r2 = extract_page(data, "text/html", "http://x.example/", with_links=True)
    assert (r.text, r.markdown, r.links) == (r2.text, r2.markdown, r2.links)


@given(html=tag_soup)
@_fuzz
def test_plaintext_whitespace_contract(html):
    out = html_to_plaintext(html)
    # collapsed: no runs of whitespace, no leading/trailing space
    assert out == out.strip()
    assert "  " not in out and "\n" not in out and "\t" not in out


@given(html=tag_soup)
@_fuzz
def test_markdown_blankline_contract(html):
    out = html_to_markdown(html)
    assert out == out.strip()
    assert "\n\n\n" not in out


@given(html=st.text(max_size=300))
@_fuzz
def test_non_html_passthrough(html):
    data = html.encode("utf-8")
    r = extract_page(data, "text/plain", "http://x.example/")
    assert r.text == data.decode("utf-8", errors="ignore")


@given(url=st.text(max_size=200))
@_fuzz
def test_url_validate_never_raises(url):
    c = validate_url(url)
    assert isinstance(c.valid, bool)
    c2 = canonicalize_url(url)
    if c2.valid:
        # canonical form is a fixpoint
        again = canonicalize_url(c2.url)
        assert again.valid and again.url == c2.url
