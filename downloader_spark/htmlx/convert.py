"""Production conversion path + JS-render detection flags.

Reference semantics:
- ``convert_content``: content_converter.py:526-552 (decode utf-8
  errors="ignore"; HTML iff "html" in content_type.lower(); exception →
  decode errors="replace").
- ``_convert_html_to_format``: content_converter.py:441-493 (strip set
  incl. iframe/noscript; selector cascade; body fallback).
- markdown fallback-to-text when empty: content_converter.py:496-512.
- detection heuristics D1/D2: content_converter.py:83-285 → pure flags
  (``needs_render``/``needs_js_render``); no caches (the engine's
  URL-seen/detection state lives in tables, not process memory).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .dom import Element, parse_html
from .markdown import html_to_markdown
from .plaintext import MAIN_CONTENT_SELECTORS, html_to_plaintext

# content_converter.py:455-468 — note: superset of the transformer default
CONVERT_STRIP = [
    "script",
    "style",
    "nav",
    "header",
    "footer",
    "aside",
    "menu",
    "form",
    "iframe",
    "noscript",
]

# Engine config mirroring reference config.py defaults
MIN_BODY_TEXT_THRESHOLD = 100  # config.py:257-262
MIN_JS_FRAMEWORK_CONTENT_THRESHOLD = 200  # config.py:263-268
SMALL_CONTENT_SIZE = 50000  # content_converter.py:260
STATIC_BODY_TEXT_THRESHOLD = 500  # content_converter.py:275
JS_HEAVY_DOMAINS = ["substack.com", "medium.com", "notion.so", "ghost.io"]  # config.py:251-254
JS_REQUIRED_PATTERNS = [  # content_converter.py:231-238
    "please enable javascript",
    "javascript is required",
    "enable js",
    "turn on javascript",
    "javascript is disabled",
    "requires javascript",
]


_CASCADE = tuple(MAIN_CONTENT_SELECTORS)


def _extract_main_for_convert(root: Element) -> Element:
    """Cascade then body-else-document (content_converter.py:472-488);
    single traversal via select_first_of."""
    found = root.select_first_of(_CASCADE)
    if found is not None:
        return found
    body = root.find("body")
    return body if body is not None else root


def _convert_html_to_format(html_text: str, output_format: str) -> str:
    root = parse_html(html_text)
    root.decompose_all(CONVERT_STRIP)
    main = _extract_main_for_convert(root)

    if output_format == "markdown":
        # content_converter.py:496-512 — transformer on the extracted
        # subtree; empty result falls back to newline-joined text
        markdown = _markdown_on_subtree(main)
        if not markdown.strip():
            text = main.get_text(separator="\n", strip=True)
            text = re.sub(r"\n\s*\n+", "\n\n", text)
            return text.strip()
        return markdown
    return _plaintext_on_subtree(main)


def _plaintext_on_subtree(main: Element) -> str:
    """html_to_plaintext(str(main), extract_main_content=False) without
    the serialize/re-parse round-trip (semantically identical: the
    transformer strip set is a subset of CONVERT_STRIP, already removed).
    """
    text = main.get_text(separator=" ", strip=True)
    return re.sub(r"\s+", " ", text).strip()


def _markdown_on_subtree(main: Element) -> str:
    from .markdown import _Ctx, _convert_node, _convert_children

    ctx = _Ctx(heading_style="atx", bullets="*")
    if main.tag in ("[document]", "html", "body"):
        md = _convert_children(main, ctx)
    else:
        md = _convert_node(main, ctx)
    md = re.sub(r"\n\s*\n\s*\n+", "\n\n", md)
    return md.strip()


def convert_content(content: bytes, content_type: str, output_format: str = "text") -> str:
    """Reference convert_content (content_converter.py:526-552)."""
    try:
        text = content.decode("utf-8", errors="ignore")
        if "html" in content_type.lower():
            return _convert_html_to_format(text, output_format)
        return text
    except Exception:
        return content.decode("utf-8", errors="replace")


@dataclass(frozen=True)
class ExtractResult:
    """One page's conversion outputs + detection flags + out-links."""

    text: str
    markdown: str
    flags: "DetectionFlags"
    links: tuple[str, ...] = ()


MAX_LINKS_PER_PAGE = 64


def _collect_links(root: Element, base_url: str, cap: int = MAX_LINKS_PER_PAGE) -> tuple[str, ...]:
    """Absolute http(s) out-links in document order, deduped
    order-preserving (the crawl rebuild's link discovery; the reference
    has no crawler loop — discovery is new surface per the north rule)."""
    from urllib.parse import urljoin

    seen: set[str] = set()
    out: list[str] = []
    for a in root.find_all("a"):
        href = a.get("href")
        if not href:
            continue
        href = href.strip()
        if href.startswith(("#", "javascript:", "mailto:")):
            continue
        try:
            absolute = urljoin(base_url, href)
        except ValueError:
            continue
        if not absolute.startswith(("http://", "https://")):
            continue
        if absolute not in seen:
            seen.add(absolute)
            out.append(absolute)
            if len(out) >= cap:
                break
    return tuple(out)


def extract_page(
    content: bytes,
    content_type: str,
    url: str = "",
    with_links: bool = False,
    link_cap: int = MAX_LINKS_PER_PAGE,
) -> ExtractResult:
    """Text + markdown + detection flags (+ out-links) in ONE parse.

    Byte-identical to calling ``convert_content(content, ct, "text")``
    and ``..."markdown")`` separately (pinned by
    tests/test_extract_parity.py): detection and link discovery read the
    tree BEFORE the conversion decompose mutates it, and conversion then
    proceeds exactly as ``_convert_html_to_format``.
    """
    try:
        text_in = content.decode("utf-8", errors="ignore")
    except Exception:  # pragma: no cover - decode with ignore never raises
        decoded = content.decode("utf-8", errors="replace")
        return ExtractResult(decoded, decoded, _NON_HTML_FLAGS)

    if "html" not in content_type.lower():
        return ExtractResult(text_in, text_in, _NON_HTML_FLAGS)

    try:
        root = parse_html(text_in)
    except Exception:
        flags = DetectionFlags(0, False, False, True, False)
        return ExtractResult("", "", flags)

    flags = _detect_from_root(root, url, len(content), raw_lower=text_in.lower())
    links = _collect_links(root, url, cap=link_cap) if with_links else ()

    root.decompose_all(CONVERT_STRIP)
    main = _extract_main_for_convert(root)

    text = _plaintext_on_subtree(main)
    markdown = _markdown_on_subtree(main)
    if not markdown.strip():
        fallback = main.get_text(separator="\n", strip=True)
        markdown = re.sub(r"\n\s*\n+", "\n\n", fallback).strip()
    return ExtractResult(text, markdown, flags, links)


# ---------------------------------------------------------------------------
# Detection heuristics → pure flags (reference D1/D2)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DetectionFlags:
    """Per-page render-detection outcome (replaces the reference's four
    LRU caches, content_converter.py:54-58, with columns)."""

    body_text_len: int
    has_content_container: bool
    is_error_page: bool
    needs_render: bool  # D1: should_use_playwright_fallback
    needs_js_render: bool  # D2: should_use_playwright_for_html


def _has_missing_metadata(root: Element) -> bool:
    """content_converter.py:141-163."""
    has_title = False
    has_description = False
    for meta in root.find_all("meta"):
        prop = meta.get("property")
        name = meta.get("name")
        if prop == "og:title" or name == "twitter:title":
            has_title = True
        elif prop == "og:description" or name == "twitter:description":
            has_description = True
    return not (has_title and has_description)


def _has_js_framework_markers(root: Element, body_text: str) -> bool:
    """content_converter.py:166-187."""
    has_marker = (
        root.select_one("#root") is not None
        or root.select_one("#app") is not None
        or root.find_by_attr("ng-app") is not None
    )
    return has_marker and len(body_text) < MIN_JS_FRAMEWORK_CONTENT_THRESHOLD


_NON_HTML_FLAGS = None  # set after DetectionFlags defined below


def detect_render_flags(url: str, content: bytes, content_type: str) -> DetectionFlags:
    """Compute D1+D2 in one parse (content_converter.py:83-285, cache-free)."""
    if "html" not in content_type.lower():
        return DetectionFlags(0, False, False, False, False)

    try:
        root = parse_html(content)
    except Exception:
        # D1 defaults True on parse failure (:136-138); D2 defaults False (:283-285)
        return DetectionFlags(0, False, False, True, False)

    return _detect_from_root(root, url, len(content))


_CONTENT_CLASSES = frozenset({"content", "post", "article-body"})
_ERROR_CLASSES = frozenset({"error", "not-found", "404", "maintenance", "coming-soon"})


class _DetectScan:
    """One-traversal collector of every element fact detection needs
    (body, container/error selectors, og/twitter metas, #root/#app/
    ng-app). Same outcomes as the per-selector queries in
    content_converter.py:83-285, measured ~2× faster per page."""

    __slots__ = (
        "body",
        "has_container",
        "has_error",
        "has_title_meta",
        "has_desc_meta",
        "has_framework_marker",
    )

    def __init__(self, root: Element) -> None:
        self.body: Element | None = None
        self.has_container = False
        self.has_error = False
        self.has_title_meta = False
        self.has_desc_meta = False
        self.has_framework_marker = False
        for el in root.iter_elements():
            tag = el.tag
            if tag == "body" and self.body is None:
                self.body = el
            elif tag == "meta":
                prop = el.attrs.get("property")
                name = el.attrs.get("name")
                if prop == "og:title" or name == "twitter:title":
                    self.has_title_meta = True
                elif prop == "og:description" or name == "twitter:description":
                    self.has_desc_meta = True
            if tag in ("main", "article"):
                self.has_container = True
            attrs = el.attrs
            if attrs:
                if "ng-app" in attrs:
                    self.has_framework_marker = True
                elem_id = attrs.get("id")
                if elem_id == "content":
                    self.has_container = True
                if elem_id in ("root", "app"):
                    self.has_framework_marker = True
                cls = attrs.get("class")
                if cls:
                    classes = cls.split()
                    if not self.has_container and any(
                        c in _CONTENT_CLASSES for c in classes
                    ):
                        self.has_container = True
                    if not self.has_error and any(
                        c in _ERROR_CLASSES for c in classes
                    ):
                        self.has_error = True


def _detect_from_root(
    root: Element, url: str, content_len: int, raw_lower: str | None = None
) -> DetectionFlags:
    scan = _DetectScan(root)
    body = scan.body
    body_text = body.get_text(strip=True) if body is not None else ""

    # --- D1: should_use_playwright_fallback (:83-138)
    if body is None or len(body_text) < MIN_BODY_TEXT_THRESHOLD:
        needs_render = False
        has_container = False
        is_error = False
    else:
        has_container = scan.has_container
        is_error = scan.has_error
        needs_render = True if has_container else (not is_error)

    # --- D2: should_use_playwright_for_html (:190-285)
    # cheap precheck: the page TEXT can only contain a js-required
    # phrase if the raw markup contains "javascript" or "enable js" —
    # OR an entity reference ('&'): parse_html decodes charrefs, so
    # e.g. '&#106;avascript' yields 'javascript' in text while the raw
    # bytes contain neither phrase (text chars ⊆ markup chars only
    # holds for entity-free markup). Skips the full get_text walk for
    # the common entity-free case.
    if (
        raw_lower is None
        or "&" in raw_lower
        or "javascript" in raw_lower
        or "enable js" in raw_lower
    ):
        text_lower = root.get_text("").lower()
        js_phrase = any(p in text_lower for p in JS_REQUIRED_PATTERNS)
    else:
        js_phrase = False
    if js_phrase:
        needs_js = True
    elif body is None:
        needs_js = False
    elif scan.has_framework_marker and len(body_text) < MIN_JS_FRAMEWORK_CONTENT_THRESHOLD:
        needs_js = True
    elif content_len < SMALL_CONTENT_SIZE and not (
        scan.has_title_meta and scan.has_desc_meta
    ):
        needs_js = True
    elif any(d in url for d in JS_HEAVY_DOMAINS):
        needs_js = True
    else:
        needs_js = False

    return DetectionFlags(
        body_text_len=len(body_text),
        has_content_container=has_container,
        is_error_page=is_error,
        needs_render=needs_render,
        needs_js_render=needs_js,
    )


_NON_HTML_FLAGS = DetectionFlags(0, False, False, False, False)
