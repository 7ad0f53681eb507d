"""Unit tests for the HTML conversion building blocks."""

from docling_plus_spark.dom import parse_html
from docling_plus_spark.html import convert_html
from docling_plus_spark.html.backend import (
    HtmlConverter,
    binary_hash_of,
    clean_unicode,
    normalize_hyperlink,
)


def test_clean_unicode_table():
    assert clean_unicode("a b") == "a b"
    assert clean_unicode("x–y—z") == "x-y-z"
    assert clean_unicode("“q” ‘s’") == "\"q\" 's'"
    assert clean_unicode("e…") == "e..."
    assert clean_unicode("no­p​q") == "nopq"


def test_binary_hash_low64_sha256():
    import hashlib

    data = b"hello"
    expect = int(hashlib.sha256(data).hexdigest(), 16) % (1 << 64)
    assert binary_hash_of(data) == expect


def test_normalize_hyperlink():
    assert normalize_hyperlink("https://example.com") == "https://example.com/"
    assert normalize_hyperlink("https://example.com/a?b=1") == "https://example.com/a?b=1"
    assert normalize_hyperlink("#frag") == "#frag"
    assert normalize_hyperlink("a/b.html") == "a/b.html"
    assert normalize_hyperlink("./x") == "x"


def test_dom_whitespace_collapse():
    root = parse_html(b"<div>a</div>\n    <div>b</div>")
    strings = [str(s) for s in root.descendants if not hasattr(s, "attrs")]
    assert "\n" in strings  # collapsed whitespace-only node


def test_dom_pre_preserves_whitespace():
    root = parse_html(b"<pre>a\n    b</pre>")
    pre = root.find("pre")
    assert pre.get_text() == "a\n    b"


def test_unclosed_tags_pop_to_match():
    root = parse_html(b"<p>one<p>two</p></p>")
    ps = root.find_all("p")
    assert len(ps) == 2


def test_cell_spans_defaults():
    root = parse_html(b'<td colspan="3" rowspan="x">t</td>')
    td = root.find("td")
    assert HtmlConverter._get_cell_spans(td) == (3, 1)
    root2 = parse_html(b'<td colspan="2abc">t</td>')
    assert HtmlConverter._get_cell_spans(root2.find("td")) == (2, 1)


def test_hidden_elements_removed():
    doc = convert_html(b"<html><body><p>keep</p><p hidden>drop</p></body></html>")
    md = doc.export_to_markdown()
    assert "keep" in md and "drop" not in md


def test_script_style_removed():
    doc = convert_html(
        b"<html><body><script>var x=1;</script><style>p{}</style>"
        b"<p>text</p></body></html>"
    )
    assert doc.export_to_markdown() == "text"


def test_furniture_before_first_heading():
    doc = convert_html(
        b"<html><body><p>nav stuff</p><h1>Title</h1><p>body</p></body></html>"
    )
    md = doc.export_to_markdown()
    assert "nav stuff" not in md
    assert md == "# Title\n\nbody"


def test_ordered_list_start():
    doc = convert_html(
        b"<html><body><ol start='5'><li>a</li><li>b</li></ol></body></html>"
    )
    assert doc.export_to_markdown() == "5. a\n6. b"


def test_table_with_spans():
    doc = convert_html(
        b"<html><body><table>"
        b"<tr><td colspan='2'>AB</td></tr>"
        b"<tr><td>a</td><td>b</td></tr>"
        b"</table></body></html>"
    )
    tbl = doc.tables[0]
    assert tbl.data.num_rows == 2 and tbl.data.num_cols == 2
    grid = tbl.data.grid()
    assert grid[0][0].text == "AB" and grid[0][1].text == "AB"


def test_paragraph_breaker_repair():
    doc = convert_html(
        b"<html><body><p>before<div>inner</div>after</p></body></html>"
    )
    texts = [t.text for t in doc.texts]
    assert texts == ["before", "inner", "after"]


def test_hostile_deep_nesting_bounded():
    """DOM depth is capped (dom.MAX_DOM_DEPTH): pathological inputs like
    '<p>'*100k (no implied end tags under these tree-builder semantics)
    must convert without a RecursionError, with text preserved —
    errors become row status downstream, never job failures."""
    from docling_plus_spark.dom import MAX_DOM_DEPTH
    from docling_plus_spark.html import convert_html

    root = parse_html(b"<p>" * 100_000 + b"text")
    depth, node = 0, root.find("p")
    while node is not None:
        depth += 1
        node = node.find("p", recursive=False)
    assert depth <= MAX_DOM_DEPTH + 1

    for probe in (
        b"<p>" * 100_000 + b"inner text",
        b"<div><b>" * 3000 + b"x",
        b"<p>deep" + b"<p>" * 5000 + b"inner",
    ):
        doc = convert_html(probe, name="p", filename="p.html")
        md = doc.export_to_markdown()
        assert isinstance(md, str)
    assert "inner text" in convert_html(
        b"<p>" * 100_000 + b"inner text", name="p", filename="p.html"
    ).export_to_markdown()
