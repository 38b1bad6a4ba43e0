"""Detection-contract tests ported from the reference suite
(/root/reference/tests/unit/test_html_rendering.py) against our
pure-flag implementations, plus _DetectScan consistency with the
per-selector helper functions it replaces."""

from downloader_spark.htmlx.convert import (
    _DetectScan,
    _has_js_framework_markers,
    _has_missing_metadata,
    detect_render_flags,
)
from downloader_spark.htmlx.dom import parse_html

from corpus import CORPUS


class TestMetadataDetection:
    def test_all_present(self):
        html = """<html><head>
            <meta property="og:title" content="Test Title">
            <meta property="og:description" content="Test Description">
        </head></html>"""
        assert not _has_missing_metadata(parse_html(html))

    def test_og_missing(self):
        assert _has_missing_metadata(parse_html("<html><head><title>T</title></head></html>"))

    def test_twitter_only(self):
        html = """<html><head>
            <meta name="twitter:title" content="T">
            <meta name="twitter:description" content="D">
        </head></html>"""
        assert not _has_missing_metadata(parse_html(html))

    def test_mixed_sources(self):
        html = """<html><head>
            <meta property="og:title" content="T">
            <meta name="twitter:description" content="D">
        </head></html>"""
        assert not _has_missing_metadata(parse_html(html))

    def test_only_title(self):
        html = '<html><head><meta property="og:title" content="T"></head></html>'
        assert _has_missing_metadata(parse_html(html))

    def test_only_description(self):
        html = '<html><head><meta property="og:description" content="D"></head></html>'
        assert _has_missing_metadata(parse_html(html))


class TestJSFrameworkMarkers:
    def _body_text(self, root):
        body = root.find("body")
        return body.get_text(strip=True) if body else ""

    def test_react_root_minimal(self):
        root = parse_html('<html><body><div id="root"></div></body></html>')
        assert _has_js_framework_markers(root, self._body_text(root))

    def test_vue_app_minimal(self):
        root = parse_html('<html><body><div id="app"></div></body></html>')
        assert _has_js_framework_markers(root, self._body_text(root))

    def test_angular_ng_app(self):
        root = parse_html('<html><body ng-app="myApp"><div></div></body></html>')
        assert _has_js_framework_markers(root, self._body_text(root))

    def test_framework_with_substantial_content(self):
        html = (
            '<html><body><div id="root"><p>'
            + ("Lorem ipsum " * 50)
            + "</p></div></body></html>"
        )
        root = parse_html(html)
        assert not _has_js_framework_markers(root, self._body_text(root))

    def test_no_markers(self):
        root = parse_html('<html><body><div class="container"><p>text</p></div></body></html>')
        assert not _has_js_framework_markers(root, self._body_text(root))


class TestShouldUseForHtml:
    """D2 end-to-end contracts (reference :144-306)."""

    def test_substack_domain_triggers(self):
        flags = detect_render_flags(
            "https://example.substack.com/p/post", *CORPUS["static_complete"]
        )
        assert flags.needs_js_render

    def test_medium_domain_triggers(self):
        flags = detect_render_flags(
            "https://medium.com/@u/post", *CORPUS["static_complete"]
        )
        assert flags.needs_js_render

    def test_missing_metadata_small_size_triggers(self):
        html = b"<html><body><p>" + b"word " * 100 + b"</p></body></html>"
        flags = detect_render_flags("http://x.example/", html, "text/html")
        assert flags.needs_js_render  # <50KB and no og:/twitter: meta

    def test_react_marker_triggers(self):
        assert detect_render_flags("http://x/", *CORPUS["react_shell"]).needs_js_render

    def test_vue_marker_triggers(self):
        assert detect_render_flags("http://x/", *CORPUS["vue_shell"]).needs_js_render

    def test_explicit_js_message_triggers(self):
        assert detect_render_flags("http://x/", *CORPUS["js_required"]).needs_js_render

    def test_static_complete_does_not_trigger(self):
        assert not detect_render_flags("http://x/", *CORPUS["static_complete"]).needs_js_render

    def test_large_html_with_metadata_does_not_trigger(self):
        meta = (
            b'<meta property="og:title" content="t"/>'
            b'<meta property="og:description" content="d"/>'
        )
        html = (
            b"<html><head>" + meta + b"</head><body><article>"
            + b"<p>Sentence with several words here.</p>" * 2500
            + b"</article></body></html>"
        )
        assert len(html) > 50000
        flags = detect_render_flags("http://x/", html, "text/html")
        assert not flags.needs_js_render

    def test_non_html_does_not_trigger(self):
        assert not detect_render_flags("http://x/", b'{"k": 1}', "application/json").needs_js_render

    def test_empty_html_does_not_trigger(self):
        # no body text → but also missing metadata + small size...
        # reference order: no body → static cache → False (:246-249)
        flags = detect_render_flags("http://x/", b"<html><head></head></html>", "text/html")
        assert not flags.needs_js_render

    def test_malformed_handles_gracefully(self):
        flags = detect_render_flags("http://x/", *CORPUS["malformed"])
        assert isinstance(flags.needs_js_render, bool)


class TestScanConsistency:
    """_DetectScan must agree with the helper functions it replaces."""

    def test_scan_matches_helpers_on_corpus(self):
        for name, (content, ctype) in CORPUS.items():
            if "html" not in ctype:
                continue
            root = parse_html(content)
            scan = _DetectScan(root)
            assert (not (scan.has_title_meta and scan.has_desc_meta)) == _has_missing_metadata(
                parse_html(content)
            ), name
            body = root.find("body")
            body_text = body.get_text(strip=True) if body else ""
            helper = _has_js_framework_markers(parse_html(content), body_text)
            scan_marker = scan.has_framework_marker and len(body_text) < 200
            assert scan_marker == helper, name


class TestEntityEncodedJsPhrase:
    """ADVICE r1: entity-encoded js-required phrases must still trigger —
    parse_html decodes charrefs, so the raw-markup precheck is only
    sound for entity-free markup."""

    def test_entity_encoded_phrase_triggers(self):
        meta = (
            b'<meta property="og:title" content="t"/>'
            b'<meta property="og:description" content="d"/>'
        )
        filler = b"<p>Plenty of regular static sentence content here.</p>" * 2000
        html = (
            b"<html><head>" + meta + b"</head><body><article>"
            b"<p>Please enable &#106;avascript to continue.</p>" + filler
            + b"</article></body></html>"
        )
        # big enough + has metadata: only the decoded phrase can trigger
        assert b"javascript" not in html.lower()
        assert detect_render_flags("http://x/", html, "text/html").needs_js_render

    def test_amp_entity_alone_does_not_trigger(self):
        meta = (
            b'<meta property="og:title" content="t"/>'
            b'<meta property="og:description" content="d"/>'
        )
        html = (
            b"<html><head>" + meta + b"</head><body><article>"
            + b"<p>Fish &amp; chips with several words here.</p>" * 2500
            + b"</article></body></html>"
        )
        assert not detect_render_flags("http://x/", html, "text/html").needs_js_render
