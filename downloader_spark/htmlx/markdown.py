"""HTML → Markdown, matching the reference transformer contract.

Reference: /root/reference/src/downloader/transformers/markdown.py:13-105
(markdownify with ATX headings, '*' bullets, custom ``pre`` fence rule
emitting ```` ```lang ```` from ``class="language-x"``). Pinned by the
ported tests in tests/test_htmlx_markdown.py (mirrors reference
tests/unit/test_markdown_transformer.py).
"""

from __future__ import annotations

import re

from .dom import Element, Node, TextNode, parse_html
from .plaintext import DEFAULT_STRIP, _extract_main

_STRUCTURAL = frozenset(
    {"[document]", "html", "body", "head", "ul", "ol", "table", "thead", "tbody", "tfoot", "tr"}
)

_HEADING = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


class _Ctx:
    __slots__ = ("heading_style", "bullets", "list_depth")

    def __init__(self, heading_style: str, bullets: str) -> None:
        self.heading_style = heading_style
        self.bullets = bullets
        self.list_depth = 0


def _raw_text(el: Element) -> str:
    return el.get_text("")


def _convert_children(el: Element, ctx: _Ctx) -> str:
    return "".join(_convert_node(c, ctx) for c in el.children)


def _convert_node(node: Node, ctx: _Ctx) -> str:
    if isinstance(node, TextNode):
        text = re.sub(r"\s+", " ", node.text)
        if text == " " and (
            node.parent is None or node.parent.tag in _STRUCTURAL
        ):
            return ""
        return text
    el = node
    assert isinstance(el, Element)
    tag = el.tag

    if tag in _HEADING:
        return _convert_heading(el, _HEADING[tag], ctx)
    if tag == "p":
        t = _convert_children(el, ctx).strip()
        return f"\n\n{t}\n\n" if t else ""
    if tag in ("ul", "ol"):
        return _convert_list(el, ctx, ordered=(tag == "ol"))
    if tag == "a":
        t = _convert_children(el, ctx).strip()
        href = el.get("href")
        return f"[{t}]({href})" if href else t
    if tag in ("strong", "b"):
        t = _convert_children(el, ctx).strip()
        return f"**{t}**" if t else ""
    if tag in ("em", "i"):
        t = _convert_children(el, ctx).strip()
        return f"*{t}*" if t else ""
    if tag == "pre":
        return _convert_pre(el)
    if tag == "code":
        t = _raw_text(el)
        return f"`{t}`" if t else ""
    if tag == "br":
        return "  \n"
    if tag == "hr":
        return "\n\n---\n\n"
    if tag == "img":
        alt = el.get("alt", "") or ""
        src = el.get("src", "") or ""
        return f"![{alt}]({src})"
    if tag == "blockquote":
        t = _convert_children(el, ctx).strip()
        if not t:
            return ""
        quoted = "\n".join(f"> {line}" if line else ">" for line in t.split("\n"))
        return f"\n\n{quoted}\n\n"
    if tag == "table":
        return _convert_table(el, ctx)
    if tag in ("div", "section", "article", "main", "figure", "figcaption", "dl"):
        t = _convert_children(el, ctx).strip()
        return f"\n\n{t}\n\n" if t else ""
    if tag in ("dt", "dd"):
        t = _convert_children(el, ctx).strip()
        return f"{t}\n" if t else ""
    # inline / unknown: pass through
    return _convert_children(el, ctx)


def _convert_heading(el: Element, level: int, ctx: _Ctx) -> str:
    t = _convert_children(el, ctx).strip()
    t = re.sub(r"\s+", " ", t)
    if not t:
        return ""
    if ctx.heading_style == "setext" and level <= 2:
        underline = ("=" if level == 1 else "-") * len(t)
        return f"\n\n{t}\n{underline}\n\n"
    return f"\n\n{'#' * level} {t}\n\n"


def _convert_list(el: Element, ctx: _Ctx, ordered: bool) -> str:
    ctx.list_depth += 1
    out: list[str] = []
    idx = 1
    for child in el.children:
        if isinstance(child, Element) and child.tag == "li":
            out.append(_convert_li(child, ctx, f"{idx}." if ordered else ctx.bullets))
            if ordered:
                idx += 1
    ctx.list_depth -= 1
    body = "".join(out)
    if ctx.list_depth > 0:
        # nested list: indent under the parent <li> (markdownify uses \t)
        return "\n" + "".join(
            f"\t{line}\n" for line in body.split("\n") if line
        )
    return f"\n\n{body}\n" if body else ""


def _convert_li(el: Element, ctx: _Ctx, marker: str) -> str:
    inline_parts: list[str] = []
    nested_parts: list[str] = []
    for child in el.children:
        if isinstance(child, Element) and child.tag in ("ul", "ol"):
            nested_parts.append(_convert_node(child, ctx))
        else:
            inline_parts.append(_convert_node(child, ctx))
    text = "".join(inline_parts).strip()
    nested = "".join(nested_parts)
    return f"{marker} {text}{nested}\n" if not nested.endswith("\n") else f"{marker} {text}{nested}"


def _convert_pre(el: Element) -> str:
    """Reference ContentMarkdownConverter.convert_pre (markdown.py:16-27)."""
    text = _raw_text(el)
    lang = ""
    code_el = el.find("code")
    if code_el is not None:
        for cls in code_el.classes:
            if cls.startswith("language-"):
                lang = cls.replace("language-", "")
                break
    return f"\n```{lang}\n{text.strip()}\n```\n"


def _convert_table(el: Element, ctx: _Ctx) -> str:
    rows: list[list[str]] = []
    for tr in el.find_all("tr"):
        cells = [
            _convert_children(c, ctx).strip()
            for c in tr.children
            if isinstance(c, Element) and c.tag in ("td", "th")
        ]
        if cells:
            rows.append(cells)
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    lines = []
    for i, row in enumerate(rows):
        row = row + [""] * (width - len(row))
        lines.append("| " + " | ".join(row) + " |")
        if i == 0:
            lines.append("| " + " | ".join("---" for _ in range(width)) + " |")
    return "\n\n" + "\n".join(lines) + "\n\n"


def html_to_markdown(
    html: str | bytes,
    *,
    strip_tags: list[str] | None = None,
    heading_style: str = "atx",
    bullets: str = "*",
    extract_main_content: bool = True,
) -> str:
    """Convert HTML to Markdown (reference markdown.py:30-105 semantics)."""
    root = parse_html(html)

    all_strip = set(DEFAULT_STRIP) | set(strip_tags or [])
    root.decompose_all(all_strip)

    content: Element = _extract_main(root) if extract_main_content else root

    ctx = _Ctx(heading_style=heading_style, bullets=bullets)
    markdown = _convert_children(content, ctx) if content.tag != "pre" else _convert_node(content, ctx)

    # Reference post-clean (markdown.py:102-103)
    markdown = re.sub(r"\n\s*\n\s*\n+", "\n\n", markdown)
    return markdown.strip()
