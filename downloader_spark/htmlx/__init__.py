"""Pure-Python HTML extraction engine (no bs4/lxml/markdownify deps).

Used both by the single-node oracle/simulator and inside the vectorized
Arrow UDFs, so Spark output is byte-identical to the oracle by
construction (BASELINE.json input_hint invariant).
"""

from .convert import (
    DetectionFlags,
    ExtractResult,
    convert_content,
    detect_render_flags,
    extract_page,
)
from .dom import Element, TextNode, parse_html
from .markdown import html_to_markdown
from .plaintext import html_to_plaintext

__all__ = [
    "DetectionFlags",
    "ExtractResult",
    "extract_page",
    "Element",
    "TextNode",
    "convert_content",
    "detect_render_flags",
    "html_to_markdown",
    "html_to_plaintext",
    "parse_html",
]
