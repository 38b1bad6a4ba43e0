"""Shared HTML corpus for parity tests.

Shapes mirror the reference's fixture families
(/root/reference/tests/fixtures/html_fixtures.py:6-283: substack
minimal/complete, react/vue shells, static-complete, js-required,
empty, malformed, medium-like, large) re-expressed compactly — no text
copied from the reference.
"""

CORPUS: dict[str, tuple[bytes, str]] = {
    "article_basic": (
        b"<html><head><title>T</title><script>var a=1;</script></head>"
        b"<body><nav>menu</nav><article><h1>Title</h1><p>Body text one.</p>"
        b"<p>Body text two.</p></article><footer>f</footer></body></html>",
        "text/html",
    ),
    "main_container": (
        b"<html><body><header>h</header><main><h2>Sub</h2>"
        b"<p>Alpha beta gamma.</p><ul><li>one</li><li>two</li></ul></main></body></html>",
        "text/html",
    ),
    "role_main": (
        b'<html><body><aside>side</aside><div role="main"><p>Centered.</p></div></body></html>',
        "text/html",
    ),
    "class_content": (
        b'<html><body><div class="content"><h1>C</h1><p>Classy text.</p></div></body></html>',
        "text/html",
    ),
    "class_post_content": (
        b'<html><body><div class="post-content"><p>Post body here with some longer '
        b"content to extract properly.</p></div></body></html>",
        "text/html",
    ),
    "body_fallback": (
        b"<html><body><h1>Plain</h1><p>No container at all.</p></body></html>",
        "text/html",
    ),
    "react_shell": (
        b'<html><head><title>app</title></head><body><div id="root"></div>'
        b'<script src="/static/js/bundle.js"></script></body></html>',
        "text/html",
    ),
    "vue_shell": (
        b'<html><body><div id="app"><!-- vue --></div><script src="/app.js"></script></body></html>',
        "text/html",
    ),
    "js_required": (
        b"<html><body><p>Please enable JavaScript to continue using this site. "
        b"More words to cross the body threshold for detection paths here.</p></body></html>",
        "text/html",
    ),
    "error_page": (
        b'<html><body><div class="error"><h1>404</h1><p>Not found page text that is '
        b"long enough to pass the minimum body threshold for the fallback detector "
        b"branch in the engine.</p></div></body></html>",
        "text/html",
    ),
    "static_complete": (
        b'<html><head><meta property="og:title" content="t"/>'
        b'<meta property="og:description" content="d"/></head>'
        b"<body><article><h1>Full</h1>" + b"<p>Sentence with several words here.</p>" * 30
        + b"</article></body></html>",
        "text/html",
    ),
    "markdown_rich": (
        b"<html><body><article><h1>Doc</h1><h2>Part</h2>"
        b'<p>See <a href="https://example.com/x">the link</a> and <strong>bold</strong> '
        b"plus <em>italic</em> and <code>inline()</code>.</p>"
        b'<pre><code class="language-python">print(1)</code></pre>'
        b"<ol><li>first</li><li>second</li></ol>"
        b"<ul><li>bullet</li></ul><blockquote>quoted words</blockquote>"
        b"</article></body></html>",
        "text/html",
    ),
    "empty_page": (b"<html><body></body></html>", "text/html"),
    "whitespace_only": (b"<html><body><p>   </p><div> \n </div></body></html>", "text/html"),
    "malformed": (b"<html><body><div>Unclosed<p>Broken<span>bits</html>", "text/html"),
    "not_html": (b"plain text payload, no tags at all", "text/plain"),
    "json_payload": (b'{"k": [1, 2, 3]}', "application/json"),
    "latin1_bytes": ("caf\xe9 bytes".encode("latin-1"), "text/html"),
    "unicode_page": (
        "<html><body><article><p>Héllo 世界 🌍 — dash…</p></article></body></html>".encode(),
        "text/html",
    ),
    "nested_deep": (
        b"<html><body>" + b"<div>" * 40 + b"<p>deep</p>" + b"</div>" * 40 + b"</body></html>",
        "text/html",
    ),
    "table_page": (
        b"<html><body><table><tr><th>A</th><th>B</th></tr>"
        b"<tr><td>1</td><td>2</td></tr></table></body></html>",
        "text/html",
    ),
    "entities": (
        b"<html><body><p>Fish &amp; chips &lt;now&gt; &#8212; ok</p></body></html>",
        "text/html",
    ),
    "comments_everywhere": (
        b"<html><!-- head comment --><body><!-- before --><p>Visible"
        b"<!-- inline --> text</p><!-- after --></body></html>",
        "text/html",
    ),
    "mixed_case_tags": (
        b"<HTML><BODY><ARTICLE><H1>Caps</H1><P>Mixed CASE tags.</P>"
        b"</ARTICLE></BODY></HTML>",
        "text/html",
    ),
    "duplicate_attrs": (
        b'<html><body><div class="content" class="other"><p>First attr wins.</p>'
        b"</div></body></html>",
        "text/html",
    ),
    "entity_in_attr": (
        b'<html><body><p><a href="/x?a=1&amp;b=2">link &copy; here</a></p></body></html>',
        "text/html",
    ),
    "nested_pre_in_article": (
        b"<html><body><article><p>Before</p><pre><code class=\"language-sql\">"
        b"SELECT *\n  FROM t\n WHERE x &lt; 2</code></pre><p>After</p>"
        b"</article></body></html>",
        "text/html",
    ),
    "stray_close_tags": (
        b"<html><body></div></span><p>Still fine</p></article></body></html>",
        "text/html",
    ),
    "attr_no_value": (
        b"<html><body><details open><summary>Click</summary><p>Hidden text</p>"
        b"</details><input disabled></body></html>",
        "text/html",
    ),
    "script_with_lt": (
        b"<html><body><script>if (a < b && c > d) { x('</div>'); }</script>"
        b"<p>Real text only.</p></body></html>",
        "text/html",
    ),
    "table_in_list": (
        b"<html><body><ul><li>Item<table><tr><td>T1</td></tr></table></li>"
        b"<li>Next</li></ul></body></html>",
        "text/html",
    ),
    "huge_attribute": (
        b'<html><body><div data-blob="' + b"x" * 5000 + b'"><p>Payload page.</p>'
        b"</div></body></html>",
        "text/html",
    ),
    "null_bytes": (
        b"<html><body><p>Null\x00byte page</p></body></html>",
        "text/html",
    ),
    "bom_prefix": (
        b"\xef\xbb\xbf<html><body><p>BOM page</p></body></html>",
        "text/html",
    ),
    "only_doctype": (b"<!DOCTYPE html>", "text/html"),
    # --- reference fixture families not yet mirrored (r2 VERDICT #8:
    # html_fixtures.py:68-283 — angular shell, SSR loading shell,
    # rendered newsletter page, medium-like loading root, >50KB page
    # with complete metadata); shapes mirrored, text original ---
    "angular_shell": (
        b'<!DOCTYPE html>\n<html>\n<head>\n    <meta charset="utf-8">\n'
        b"    <title>Angular App</title>\n</head>\n"
        b'<body ng-app="crawlApp">\n    <div ng-view></div>\n'
        b'    <script src="/angular.js"></script>\n</body>\n</html>',
        "text/html",
    ),
    "ssr_loading_shell": (
        b'<!DOCTYPE html>\n<html>\n<head>\n    <meta charset="utf-8">\n'
        b'    <title></title>\n    <link rel="stylesheet" href="/styles.css">\n'
        b'    <script src="/bundle.js"></script>\n</head>\n<body>\n'
        b'    <div id="root"></div>\n    <p>Loading...</p>\n</body>\n</html>',
        "text/html",
    ),
    "newsletter_rendered": (
        b'<!DOCTYPE html>\n<html>\n<head>\n    <meta charset="utf-8">\n'
        b'    <title data-rh="true">Wave Scheduling Deep Dive - by A. Writer</title>\n'
        b'    <meta property="og:title" content="Wave Scheduling Deep Dive">\n'
        b'    <meta property="og:description" content="How crawl waves amortize">\n'
        b'    <meta property="og:image" content="https://cdn.example/img/wave.jpeg">\n'
        b'    <meta name="twitter:title" content="Wave Scheduling Deep Dive">\n'
        b'    <meta name="twitter:description" content="How crawl waves amortize">\n'
        b'</head>\n<body>\n    <div id="root">\n        <article>\n'
        b"            <h1>Wave Scheduling Deep Dive</h1>\n"
        b"            <p>A long discussion of frontier budgeting and politeness.</p>\n"
        b"            <p>Second paragraph covering snapshot lineage in depth.</p>\n"
        b"            <p>Third paragraph on per-host ranking and skew salts.</p>\n"
        b"        </article>\n    </div>\n</body>\n</html>",
        "text/html",
    ),
    "loading_root_shell": (
        b'<!DOCTYPE html>\n<html>\n<head>\n    <meta charset="utf-8">\n'
        b'    <title></title>\n</head>\n<body>\n    <div id="root">\n'
        b"        <p>Loading article body...</p>\n    </div>\n</body>\n</html>",
        "text/html",
    ),
    "large_article_50kb": (
        b'<!DOCTYPE html>\n<html>\n<head>\n    <meta charset="utf-8">\n'
        b"    <title>Large Article</title>\n"
        b'    <meta property="og:title" content="Large Article">\n'
        b'    <meta property="og:description" content="A very large page">\n'
        b'    <meta property="og:image" content="https://cdn.example/big.jpg">\n'
        b"</head>\n<body>\n    <article>\n        <h1>Large Article</h1>\n"
        + b"<p>Repeated filler sentence with enough words to build size fast. </p>\n" * 800
        + b"    </article>\n</body>\n</html>",
        "text/html",
    ),
    "xhtml_self_closing": (
        b'<html><body><p>Line one<br/>line two</p><img src="/x.png" alt="pic"/>'
        b"</body></html>",
        "text/html",
    ),
}
