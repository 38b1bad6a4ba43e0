"""Golden contract tests for html_to_plaintext.

Ported from the reference suite
/root/reference/tests/unit/test_plaintext_transformer.py — these pin the
external behavior our Spark extract UDF must reproduce byte-for-byte.
"""

import pytest

from downloader_spark.htmlx import html_to_plaintext


class TestBasicPlaintextConversion:
    def test_simple_paragraph(self):
        html = "<html><body><p>Hello world</p></body></html>"
        assert html_to_plaintext(html) == "Hello world"

    def test_multiple_paragraphs_default(self):
        html = "<html><body><p>First paragraph.</p><p>Second paragraph.</p></body></html>"
        result = html_to_plaintext(html)
        assert "First paragraph." in result
        assert "Second paragraph." in result
        assert "\n\n" not in result

    def test_heading_text_extraction(self):
        html = """
        <html><body>
            <h1>Main Title</h1>
            <h2>Subtitle</h2>
            <p>Content here.</p>
        </body></html>
        """
        result = html_to_plaintext(html)
        assert "Main Title" in result
        assert "Subtitle" in result
        assert "Content here" in result
        assert "#" not in result

    def test_list_text_extraction(self):
        html = """
        <html><body>
            <ul>
                <li>First item</li>
                <li>Second item</li>
            </ul>
        </body></html>
        """
        result = html_to_plaintext(html)
        assert "First item" in result
        assert "Second item" in result
        assert "* " not in result
        assert "- " not in result

    def test_link_text_extraction(self):
        html = '<html><body><p>Visit <a href="https://example.com">our website</a> for more.</p></body></html>'
        result = html_to_plaintext(html)
        assert "Visit" in result
        assert "our website" in result
        assert "for more" in result
        assert "https://example.com" not in result
        assert "[" not in result
        assert "]" not in result


class TestContentExtraction:
    def test_article_tag_extraction(self):
        html = """
        <html><body>
            <nav>Navigation here</nav>
            <article>
                <h1>Article Title</h1>
                <p>Article content.</p>
            </article>
            <footer>Footer here</footer>
        </body></html>
        """
        result = html_to_plaintext(html)
        assert "Article Title" in result
        assert "Article content" in result
        assert "Navigation" not in result
        assert "Footer" not in result

    def test_main_tag_extraction(self):
        html = """
        <html><body>
            <header>Header here</header>
            <main>
                <h1>Main Content</h1>
                <p>Main text.</p>
            </main>
        </body></html>
        """
        result = html_to_plaintext(html)
        assert "Main Content" in result
        assert "Main text" in result
        assert "Header" not in result

    def test_role_main_extraction(self):
        html = """
        <html><body>
            <aside>Sidebar</aside>
            <div role="main">
                <h1>Main Area</h1>
                <p>Content here.</p>
            </div>
        </body></html>
        """
        result = html_to_plaintext(html)
        assert "Main Area" in result
        assert "Content here" in result
        assert "Sidebar" not in result

    @pytest.mark.parametrize(
        "class_name",
        ["content", "post-content", "entry-content", "article-content"],
    )
    def test_class_content_extraction(self, class_name):
        html = f"""
        <html><body>
            <nav>Menu</nav>
            <div class="{class_name}">
                <h1>Class Content</h1>
                <p>Extracted text.</p>
            </div>
        </body></html>
        """
        result = html_to_plaintext(html)
        assert "Class Content" in result
        assert "Extracted text" in result

    def test_fallback_to_body(self):
        html = """
        <html><body>
            <h1>Page Title</h1>
            <p>Some body content.</p>
        </body></html>
        """
        result = html_to_plaintext(html)
        assert "Page Title" in result
        assert "Some body content" in result

    def test_extract_main_content_false(self):
        html = """
        <html><body>
            <div class="wrapper">
                <h1>Full Page</h1>
                <p>All content included.</p>
            </div>
        </body></html>
        """
        result = html_to_plaintext(html, extract_main_content=False)
        assert "Full Page" in result
        assert "All content included" in result


class TestTagStripping:
    def test_default_tag_stripping(self):
        html = """
        <html><body>
            <script>alert('xss')</script>
            <style>.red { color: red; }</style>
            <nav>Navigation</nav>
            <header>Site Header</header>
            <main>
                <h1>Content</h1>
                <p>Main text.</p>
            </main>
            <footer>Site Footer</footer>
            <aside>Sidebar</aside>
            <menu>Menu items</menu>
            <form>Form content</form>
        </body></html>
        """
        result = html_to_plaintext(html)
        assert "Content" in result
        assert "Main text" in result
        assert "alert" not in result
        assert ".red" not in result
        assert "Navigation" not in result
        assert "Site Header" not in result
        assert "Site Footer" not in result
        assert "Sidebar" not in result
        assert "Menu items" not in result
        assert "Form content" not in result

    def test_script_removal(self):
        html = """
        <html><body>
            <script>
                function malicious() { alert('xss'); }
            </script>
            <p>Real content here.</p>
        </body></html>
        """
        result = html_to_plaintext(html)
        assert "Real content here" in result
        assert "malicious" not in result
        assert "alert" not in result

    def test_style_removal(self):
        html = """
        <html><body>
            <style>
                body { background: red; }
                .hidden { display: none; }
            </style>
            <p>Visible text.</p>
        </body></html>
        """
        result = html_to_plaintext(html)
        assert "Visible text" in result
        assert "background" not in result
        assert "display" not in result

    def test_custom_tag_stripping(self):
        html = """
        <html><body>
            <div class="advertisement">Buy now!</div>
            <main>
                <h1>Article</h1>
                <p>Real content.</p>
            </main>
        </body></html>
        """
        result_default = html_to_plaintext(html, extract_main_content=False)
        assert "Buy now" in result_default
        result_stripped = html_to_plaintext(html, strip_tags=["div"], extract_main_content=False)
        assert "Buy now" not in result_stripped


class TestWhitespaceHandling:
    def test_default_space_separator(self):
        html = "<html><body><p>First</p><p>Second</p></body></html>"
        result = html_to_plaintext(html)
        assert "First" in result
        assert "Second" in result

    def test_custom_separator(self):
        html = "<html><body><span>One</span><span>Two</span><span>Three</span></body></html>"
        result = html_to_plaintext(html, separator="|", extract_main_content=False)
        assert "|" in result

    def test_multiple_whitespace_normalization(self):
        html = "<html><body><p>Too   many    spaces   here.</p></body></html>"
        result = html_to_plaintext(html)
        assert "Too many spaces here" in result
        assert "   " not in result

    def test_newlines_in_source_normalized(self):
        html = """
        <html><body>
            <p>Line one.


            Line two with gaps.</p>
        </body></html>
        """
        result = html_to_plaintext(html)
        assert "Line one" in result
        assert "Line two" in result
        assert "\n\n\n" not in result


class TestParagraphPreservation:
    def test_paragraph_preservation_enabled(self):
        html = "<html><body><p>First paragraph.</p><p>Second paragraph.</p></body></html>"
        result = html_to_plaintext(html, preserve_paragraphs=True)
        assert "First paragraph." in result
        assert "Second paragraph." in result

    def test_br_tag_handling(self):
        html = "<html><body><p>Line one.<br>Line two.</p></body></html>"
        result = html_to_plaintext(html, preserve_paragraphs=True)
        assert "Line one" in result
        assert "Line two" in result

    def test_block_elements_processing(self):
        html = """
        <html><body>
            <h1>Title</h1>
            <div>First block</div>
            <div>Second block</div>
        </body></html>
        """
        result = html_to_plaintext(html, preserve_paragraphs=True)
        assert "Title" in result
        assert "First block" in result
        assert "Second block" in result

    def test_newline_normalization_with_preserve(self):
        html = """
        <html><body>
            <p>Para one.</p>
            <p>Para two.</p>
            <p>Para three.</p>
        </body></html>
        """
        result = html_to_plaintext(html, preserve_paragraphs=True)
        assert "\n\n\n" not in result


class TestEdgeCases:
    def test_empty_html(self):
        assert html_to_plaintext("<html><body></body></html>") == ""

    def test_malformed_html(self):
        html = "<html><body><div>Unclosed tags<p>Malformed</html>"
        result = html_to_plaintext(html)
        assert "Unclosed tags" in result
        assert "Malformed" in result

    def test_bytes_input(self):
        html = b"<html><body><h1>Bytes Input</h1><p>Works fine.</p></body></html>"
        result = html_to_plaintext(html)
        assert "Bytes Input" in result
        assert "Works fine" in result

    def test_bytes_input_with_unicode(self):
        html = "<html><body><p>Hello 世界</p></body></html>".encode()
        result = html_to_plaintext(html)
        assert "Hello 世界" in result

    def test_unicode_characters(self):
        html = "<html><body><p>Café résumé naïve</p></body></html>"
        result = html_to_plaintext(html)
        assert "Café" in result
        assert "résumé" in result
        assert "naïve" in result

    def test_emoji_support(self):
        html = "<html><body><p>Hello \U0001f44b World \U0001f30d</p></body></html>"
        result = html_to_plaintext(html)
        assert "\U0001f44b" in result
        assert "\U0001f30d" in result

    def test_nested_structures(self):
        html = """
        <html><body>
            <div>
                <div>
                    <div>
                        <p>Deeply nested content.</p>
                    </div>
                </div>
            </div>
        </body></html>
        """
        assert "Deeply nested content" in html_to_plaintext(html)

    def test_only_whitespace_content(self):
        html = "<html><body><p>   </p><div>   </div></body></html>"
        assert html_to_plaintext(html) == ""

    def test_special_html_entities(self):
        html = "<html><body><p>Less &lt; Greater &gt; Amp &amp;</p></body></html>"
        result = html_to_plaintext(html)
        assert "<" in result
        assert ">" in result
        assert "&" in result
        assert "&lt;" not in result
        assert "&gt;" not in result
        assert "&amp;" not in result

    def test_table_content_extraction(self):
        html = """
        <html><body>
            <table>
                <tr><td>Cell 1</td><td>Cell 2</td></tr>
                <tr><td>Cell 3</td><td>Cell 4</td></tr>
            </table>
        </body></html>
        """
        result = html_to_plaintext(html)
        for cell in ("Cell 1", "Cell 2", "Cell 3", "Cell 4"):
            assert cell in result
