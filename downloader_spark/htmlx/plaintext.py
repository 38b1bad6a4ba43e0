"""HTML → plain text, matching the reference transformer exactly.

Reference: /root/reference/src/downloader/transformers/plaintext.py:11-87.
Contract pinned by the ported tests in tests/test_htmlx_plaintext.py
(mirrors reference tests/unit/test_plaintext_transformer.py).
"""

from __future__ import annotations

import re

from .dom import Element, TextNode, parse_html

DEFAULT_STRIP = ["script", "style", "nav", "header", "footer", "aside", "menu", "form"]

MAIN_CONTENT_SELECTORS = [
    "article",
    "main",
    '[role="main"]',
    ".content",
    ".post-content",
    ".entry-content",
    ".article-content",
]

_BLOCK_TAGS = ["p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li"]


_CASCADE = tuple(MAIN_CONTENT_SELECTORS)


def _extract_main(root: Element) -> Element:
    """Selector cascade then <body> fallback (plaintext.py:49-68);
    single-pass via select_first_of (≡ select_one per selector in order)."""
    found = root.select_first_of(_CASCADE)
    if found is not None:
        return found
    body = root.find("body")
    return body if body is not None else root


def html_to_plaintext(
    html: str | bytes,
    *,
    strip_tags: list[str] | None = None,
    extract_main_content: bool = True,
    separator: str = " ",
    preserve_paragraphs: bool = False,
) -> str:
    """Convert HTML to plain text (reference plaintext.py:11-87 semantics).

    strip=True text joining drops whitespace-only nodes, so the
    ``preserve_paragraphs`` newline insertions are normalized away just as
    in the reference (documented behavior, reference test
    test_plaintext_transformer.py:300-350).
    """
    root = parse_html(html)

    all_strip = set(DEFAULT_STRIP) | set(strip_tags or [])
    root.decompose_all(all_strip)

    content: Element = _extract_main(root) if extract_main_content else root

    if preserve_paragraphs:
        # <br> → "\n" text node (plaintext.py:73-74)
        for br in content.find_all("br"):
            if br.parent is not None:
                br.parent.replace_child(br, TextNode("\n"))
        # "\n\n" after block elements (plaintext.py:75-78)
        for block in content.find_all(_BLOCK_TAGS):
            if block.parent is not None:
                block.parent.insert_after(TextNode("\n\n"), block)
        text = content.get_text(separator=" ", strip=True)
        text = re.sub(r"\n\s*\n+", "\n\n", text)
    else:
        text = content.get_text(separator=separator, strip=True)
        text = re.sub(r"\s+", " ", text)

    return text.strip()
