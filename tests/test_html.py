"""HTML -> span-document extraction: offsets, title shift, charset sniff,
interleaving order, and the spans-sorted invariant on output."""

from __future__ import annotations

from cc_dbp_spark.operators import html as H
from cc_dbp_spark.operators import spans as S

PAGE = b"""<html><head><title>My  Page</title>
<script>var x = "<p>not text</p>";</script></head>
<body><h1>Header One</h1>
<p>First <b>bold</b> paragraph</p>
<a href="http://x/a">link text</a>
<p></p>
<a href="http://x/b"><img src="i.png"></a>
</body></html>"""


def test_extract_one_offsets():
    spans = H._extract_one("u", PAGE.decode(), min_k_words=2)
    kinds = [(s["kind"], s["text"], s["media_ref"]) for s in spans]
    assert kinds == [
        ("title", "My Page", None),
        ("section_header", "Header One", None),
        ("paragraph", "First bold paragraph", None),
        ("text_formatting", "bold", None),
        ("link", "link text", "http://x/a"),
        ("link", "", "http://x/b"),
    ]
    # title at 0; body starts at len("My Page")+2 = 9; offsets ordered
    assert spans[0]["offset"] == 0
    assert spans[1]["offset"] == 9
    # 'bold' sits inside its paragraph: block offset 20 + len('First ')
    assert spans[3]["offset"] == spans[2]["offset"] + 6
    offs = [s["offset"] for s in spans]
    assert offs == sorted(offs)


def test_min_k_words_filter_and_malformed():
    page = ("<p>one two three four five</p><p>too short</p>"
            "<p>unclosed with at least five words<h2>Head <i>x</i></h2>")
    spans = H._extract_one("u", page)  # default min_k_words=5
    got = [(s["kind"], s["text"]) for s in spans]
    assert got == [
        ("paragraph", "one two three four five"),
        ("paragraph", "unclosed with at least five words"),
        ("section_header", "Head x"),
        ("text_formatting", "x"),
    ]
    # dropped blocks do not advance the offset
    assert spans[1]["offset"] == len("one two three four five") + 1


def test_detect_charset():
    assert H.detect_charset("café".encode("utf-8")) == "utf-8"
    assert H.detect_charset(b"\xef\xbb\xbfhi") == "utf-8-sig"
    assert H.detect_charset(b'<meta charset="ISO-8859-1">') == "iso-8859-1"
    # unlabeled legacy bytes: accented latin decodes as letters under
    # cp1252 (the WHATWG latin-1 -> cp1252 rule wins the trial score)
    assert H.detect_charset(b"caf\xe9 latin") == "cp1252"
    # a lone 0x80 is ambiguous (euro in cp1252, letter Dje in cp1251);
    # the alpha-ratio scorer deterministically prefers the letter
    # reading — the point is determinism, not omniscience
    assert H.detect_charset(b"price \x80 42") == "cp1251"
    # unlabeled Cyrillic (cp1251 bytes): letters only under cp1251
    ru = "привет мир это тест".encode("cp1251")
    assert H.detect_charset(b"<p>" + ru + b"</p>") == "cp1251"
    # BOM-less utf-16 via null-byte density
    assert H.detect_charset("hello world page".encode("utf-16-le")) == "utf-16-le"
    assert H.detect_charset("hello world page".encode("utf-16-be")) == "utf-16-be"


def test_spark_html_to_documents(spark):
    pages = spark.createDataFrame(
        [("http://site/p1", bytearray(PAGE)), ("http://site/bad", bytearray(b"\xff\xfeno"))],
        "url string, payload binary",
    )
    docs = H.html_to_documents(pages, min_k_words=2)
    rows = {r.doc_id: r for r in docs.collect()}
    assert rows["http://site/p1"].charset == "utf-8"
    assert [s.kind for s in rows["http://site/p1"].spans] == [
        "title", "section_header", "paragraph", "text_formatting", "link", "link",
    ]
    # output obeys the sorted-span invariant
    ok = {r.doc_id: r.ok for r in S.spans_sorted_ok(docs.select("doc_id", "spans")).collect()}
    assert all(ok.values())
    # outlinks extracted from the produced docs feed the frontier
    edges = {(r.src, r.dst) for r in S.outlink_edges(docs.select("doc_id", "spans")).collect()}
    assert ("http://site/p1", "http://x/a") in edges


def test_density_classifier_drops_nav_chrome():
    """Public boilerpipe NumWordsRules tree: an all-link nav block is
    boilerplate; a long low-link paragraph is content; a short block
    flanked by content survives; a short isolated block drops."""
    from cc_dbp_spark.operators import html as H

    page = (
        "<html><head><title>T</title></head><body>"
        '<p><a href="/a">Home</a> <a href="/b">About</a> '
        '<a href="/c">Contact</a> <a href="/d">Login</a></p>'
        "<p>" + ("word " * 50).strip() + "</p>"
        "<p>short tail</p>"
        "</body></html>"
    )
    spans = H._extract_one("u", page, classifier="density")
    kinds_texts = [(s["kind"], s["text"][:20]) for s in spans]
    assert kinds_texts[0] == ("title", "T")
    # nav dropped entirely (no link spans), content + tail kept
    assert all(s["kind"] != "link" for s in spans)
    assert kinds_texts[1][0] == "paragraph" and kinds_texts[1][1].startswith("word")
    assert kinds_texts[2] == ("paragraph", "short tail")
    # offsets: content directly after title + 2; dropped nav advances nothing
    assert spans[1]["offset"] == len("T") + 2

    # the boilerpipe sandwich: <=40-word paragraph after a link-dense
    # block and before a short one is classified boilerplate
    page2 = page.replace(("word " * 50).strip(), ("word " * 20).strip())
    spans2 = H._extract_one("u", page2, classifier="density")
    texts2 = [s["text"] for s in spans2]
    assert texts2 == ["T", "short tail"]


def test_block_features_link_and_text_density():
    from cc_dbp_spark.operators import html as H

    ex = H._Extractor()
    ex.feed('<p>one <a href="/x">two three</a> four</p><a href="/y">pure link</a>')
    ex.close()
    ex._flush()
    feats = H._block_features(ex.blocks)
    # block 1: 4 words, 2 anchored -> link density 0.5
    assert feats[0][0] == 4 and abs(feats[0][1] - 0.5) < 1e-9
    # standalone link block: all words anchored
    assert feats[1][0] == 2 and feats[1][1] == 1.0
    # text density: words per 80-col wrapped line
    ex2 = H._Extractor()
    ex2.feed("<p>" + ("w " * 100).strip() + "</p>")
    ex2.close()
    ex2._flush()
    w, ld, td = H._block_features(ex2.blocks)[0]
    assert w == 100 and ld == 0.0
    assert abs(td - 100 / -(-199 // 80)) < 1e-9


def test_leading_inline_run_in_bare_text():
    """Formatting that opens before any block lazily starts a paragraph
    (like bare text does): the run used to be dropped while its text
    survived."""
    from cc_dbp_spark.operators.html import _extract_one

    spans = _extract_one(
        "u", "<body><b>Bold</b> plus quite a few more words here</body>"
    )
    kinds = [(s["kind"], s["text"]) for s in spans]
    assert ("paragraph", "Bold plus quite a few more words here") in kinds
    assert ("text_formatting", "Bold") in kinds


def test_nested_anchor_inside_link_block_keeps_inner_href():
    """A standalone link block emits its collected inline runs too —
    the nested anchor's href is an outlink signal that was thrown away."""
    from cc_dbp_spark.operators.html import _extract_one

    spans = _extract_one(
        "u", '<body><a href="http://x.ex/outer">outer '
             '<a href="http://y.ex/inner">inner</a> tail</a></body>'
    )
    links = {(s["text"], s["media_ref"]) for s in spans if s["kind"] == "link"}
    assert ("outer inner tail", "http://x.ex/outer") in links
    assert ("inner", "http://y.ex/inner") in links
