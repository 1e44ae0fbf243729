"""Pure-kernel unit + property tests (no Ray).

Analog of the reference's validation-schema unit tests
(``pipeline_components/img_to_json/ollama+ocr_to_json/test_pipeline.py:70-120``)
applied to the extraction kernel: hand-built HTML fixtures + span
invariants (SURVEY.md §5).
"""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from bb_ocr_ray.kernel.extract import domain_of, extract_page
from bb_ocr_ray.kernel.normalize import collapse_ws, decode_html, sniff_charset

FULL_PAGE = b"""<!doctype html><html><head><meta charset="utf-8"><title>T</title>
<style>body{color:red}</style><script>var x="<p>fake</p>";</script></head>
<body>
<nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li></ul></nav>
<header><h1>Site Title Here</h1></header>
<article><p>First main paragraph with plenty of content text.</p>
<p>Second &amp; paragraph <b>with bold</b> and <a href="x">a link</a> inline.</p></article>
<div class="share"><a href="c">Share</a> <a href="d">Tweet</a></div>
<footer><a href="/p">Privacy</a> | <a href="/t">Terms</a></footer>
</body></html>"""


def test_full_page_extraction():
    r = extract_page("https://a.example.com/x", FULL_PAGE)
    assert r["status"] == "ok"
    assert r["n_blocks_kept"] == 2
    assert r["text"] == (
        "First main paragraph with plenty of content text.\n\n"
        "Second & paragraph with bold and a link inline."
    )
    # nav/header/footer/share never leak
    for bad in ("Home", "About", "Site Title", "Share", "Tweet", "Privacy", "Terms"):
        assert bad not in r["text"]
    # script/style content never leaks
    assert "fake" not in r["text"]
    assert "color:red" not in r["text"]


def test_span_invariants():
    r = extract_page("https://a.example.com/x", FULL_PAGE)
    text, spans = r["text"], r["spans"]
    kept = [b for b in r["blocks"] if b["is_content"]]
    assert len(spans) == len(kept) == r["n_blocks_kept"]
    prev_stop = -1
    for span, blk in zip(spans, kept):
        assert span["start"] > prev_stop           # sorted, non-overlapping
        assert text[span["start"]:span["stop"]] == blk["text"]  # round-trip
        prev_stop = span["stop"]


def test_deterministic_and_idempotent():
    a = extract_page("https://a.example.com/x", FULL_PAGE)
    b = extract_page("https://a.example.com/x", FULL_PAGE)
    assert a == b
    # re-extracting the emitted text (wrapped as trivial html) is stable
    again = extract_page("u", ("<p>" + a["text"] + "</p>").encode())
    assert collapse_ws(again["text"]) == collapse_ws(a["text"].replace("\n\n", " "))


def test_error_as_data_never_raises():
    for html in (None, b"", b"\xff\xfe\x00garbage", b"<" * 1000,
                 b"<p>" + b"\x00" * 100 + b"</p>", b"</div></div>",
                 b"<!doctype html>"):
        r = extract_page("https://x.com/y", html)
        assert r["status"] in ("ok", "empty", "truncated", "parse_error")
        assert isinstance(r["text"], str)


def test_megadoc_truncation_flag():
    from bb_ocr_ray.config import ExtractConfig

    cfg = ExtractConfig(max_html_bytes=1024)
    big = b"<p>" + b"word " * 1000 + b"</p>"
    r = extract_page("https://x.com/mega", big, cfg)
    assert r["status"] == "truncated"
    assert any(s.startswith("truncated:") for s in r["steps_applied"])


def test_charset_declared_latin1():
    html = "<meta charset='latin-1'><p>café au lait près de la gare</p>".encode("latin-1")
    r = extract_page("https://x.com/l1", html)
    assert "café" in r["text"]
    assert sniff_charset(html) == "latin-1"


def test_charset_bom_utf16():
    import codecs

    html = codecs.BOM_UTF16_LE + "<p>utf sixteen content here totally</p>".encode("utf-16-le")
    text, steps = decode_html(html)
    assert "utf sixteen" in text
    assert steps == ["decode:utf-16"]
    assert not text.startswith("\ufeff")    # BOM consumed, not leaked


def test_entity_decode():
    r = extract_page("u", b"<p>Fish &amp; chips &#8212; &lt;tasty&gt; &quot;good&quot;</p>")
    assert r["text"] == 'Fish & chips — <tasty> "good"'


def test_link_density_drops_nav():
    r = extract_page("u", b'<ul><li><a href="/a">One two</a></li>'
                          b'<li><a href="/b">Three four</a></li></ul>')
    assert r["text"] == ""
    assert r["status"] == "empty"


def test_drop_ancestor_subtree():
    r = extract_page("u", b"<footer><p>this footer paragraph is long enough to pass "
                          b"the length rule but must still be dropped</p></footer>")
    assert r["text"] == ""


def test_domain_of():
    assert domain_of("https://Sub.Example.COM:8443/p?q=1") == "sub.example.com"
    assert domain_of("http://user:pw@host.net/x") == "host.net"
    assert domain_of("not a url") == ""


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=400))
def test_property_arbitrary_text_roundtrip(s):
    """Any text wrapped in <p> comes back whitespace-collapsed; spans
    always round-trip."""
    import html as h

    r = extract_page("u", ("<p>" + h.escape(s) + "</p>").encode("utf-8"))
    assert r["status"] in ("ok", "empty")
    if r["text"]:
        for span in r["spans"]:
            assert r["text"][span["start"]:span["stop"]]
    expected = collapse_ws(s)
    if len(expected) >= 10:
        assert r["text"] == expected


@settings(max_examples=25, deadline=None)
@given(st.binary(max_size=2048))
def test_property_arbitrary_bytes_total(data):
    """extract_page is total: arbitrary bytes never raise."""
    r = extract_page("https://f.com/x", data)
    assert r["status"] in ("ok", "empty", "truncated", "parse_error")


def test_arrow_schema_roundtrip():
    from bb_ocr_ray.schema import EXTRACTED_SCHEMA

    recs = [extract_page("https://a.com/1", FULL_PAGE),
            extract_page("https://a.com/2", b"")]
    tbl = pa.Table.from_pylist(recs, schema=EXTRACTED_SCHEMA)
    assert tbl.num_rows == 2
    back = tbl.to_pylist()
    assert back[0]["text"] == recs[0]["text"]


def test_fast_and_stdlib_segmenters_agree():
    """Differential: the regex tokenizer and html.parser front-ends drive
    the same handlers — outputs must be identical on the whole fixture
    corpus (template pages + edge cases)."""
    import duckdb

    from bb_ocr_ray.kernel.normalize import decode_html
    from bb_ocr_ray.kernel.segment import segment
    from bb_ocr_ray.sources.pages import edge_case_pages, html_for

    def rep(bs):
        return [(b.tag_path, b.depth, b.ancestor_dropped, b.finalize(),
                 b.raw_chars, b.link_chars, b.n_tags) for b in bs]

    docs = duckdb.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet'"
    ).df()
    for d, t in zip(docs.doc_id, docs.text):
        pg = html_for(int(d), t).decode()
        assert rep(segment(pg, engine="fast")) == rep(segment(pg, engine="stdlib"))
    ep = edge_case_pages()
    for h in ep.column("html").to_pylist():
        t, _ = decode_html(h)
        assert rep(segment(t, engine="fast")) == rep(segment(t, engine="stdlib"))


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="<>/ab c&;!-=\"'p", max_size=300))
def test_property_segmenters_never_crash_on_tag_soup(s):
    from bb_ocr_ray.kernel.segment import segment

    fast = segment(s, engine="fast")
    std = segment(s, engine="stdlib")
    # both engines are total; on pathological soup they may tokenize
    # differently, but emitted text is always a string and flags sane
    for b in fast + std:
        assert isinstance(b.finalize(), str)
        assert b.raw_chars >= b.link_chars >= 0


def test_fast_tokenizer_no_redos():
    """Review regression: pathological quote runs in an unterminated tag
    must tokenize in linear time (was exponential backtracking)."""
    import time

    from bb_ocr_ray.kernel.segment import segment

    t0 = time.time()
    segment('<p>hello</p><a ' + '"' * 2000)
    assert time.time() - t0 < 1.0


def test_unquoted_attr_trailing_slash_not_selfclosing():
    """Review regression: href=http://x.com/ is a value, not a
    self-close; fast and stdlib engines must agree on link density."""
    from bb_ocr_ray.kernel.segment import segment

    s = '<p><a href=http://x.com/>some link text here</a> rest of text</p>'
    def rep(bs):
        return [(b.finalize(), b.raw_chars, b.link_chars) for b in bs]
    assert rep(segment(s, engine="fast")) == rep(segment(s, engine="stdlib"))
    assert segment(s, engine="fast")[0].link_chars > 0


def test_truncation_never_mojibakes_utf8():
    """Review regression: byte truncation backs off to a UTF-8 boundary
    instead of flipping the document to latin-1."""
    from bb_ocr_ray.config import ExtractConfig

    body = ("<p>" + "café au lait " * 200 + "</p>").encode("utf-8")
    for cap in range(1000, 1016):
        r = extract_page("u", body, ExtractConfig(max_html_bytes=cap))
        assert "Ã" not in r["text"]
        assert "decode:latin-1" not in r["steps_applied"]


def test_kernel_review_regressions():
    """Fourth review wave: charset-sniff prescan, stray '<' preservation,
    rawtext boundaries, textarea suppression, truncation hygiene."""
    import codecs

    from bb_ocr_ray.config import ExtractConfig
    from bb_ocr_ray.kernel.segment import segment

    def rep(bs):
        return [(b.tag_path, b.finalize()) for b in bs]

    # stray '<' in prose is data, engines agree
    s = "<p>1 < 2 is definitely true here</p>"
    assert rep(segment(s, engine="fast")) == rep(segment(s, engine="stdlib"))
    assert "1 < 2" in segment(s, engine="fast")[0].finalize()
    # </styled> must not close <style>
    s = "<body><style>.x{color:red}</styled><p>real paragraph</p></body>"
    assert rep(segment(s, engine="fast")) == rep(segment(s, engine="stdlib")) == []
    # textarea content never leaks into page text
    s = ("<body><textarea><p>hello world example</p></textarea>"
         "<p>after text is here</p></body>")
    assert rep(segment(s, engine="fast")) == rep(segment(s, engine="stdlib"))
    assert all("hello" not in t for _, t in rep(segment(s, engine="fast")))
    # charset in a comment or a description attr must not hijack decoding
    r = extract_page("u", ('<!-- <meta charset="koi8-r"> -->'
                           '<meta charset="utf-8">'
                           "<p>Привет мир дорогой длинный текст</p>").encode())
    assert "Привет" in r["text"]
    r = extract_page("u", b'<meta name="description" '
                          b'content="set charset=shift_jis in html">'
                          b"<p>plain ascii body long enough</p>")
    assert "decode:utf-8" in r["steps_applied"]
    # real http-equiv charset still honored
    r = extract_page("u", ('<meta http-equiv="Content-Type" '
                           'content="text/html; charset=latin-1">'
                           "<p>café latin page long enough</p>").encode("latin-1"))
    assert "café" in r["text"]
    # truncated utf-16 megadoc: lenient decode, never a latin-1 flip
    body = codecs.BOM_UTF16_LE + ("<p>" + "한글 내용 " * 4000 + "</p>").encode("utf-16-le")
    r = extract_page("u", body, ExtractConfig(max_html_bytes=20001))
    assert "decode:latin-1" not in r["steps_applied"]
    assert "한글" in r["text"]
    # dangling half-tag at the cut is trimmed, not emitted as text
    r = extract_page("u", b'<p>good text content here</p><div class="navi',
                     ExtractConfig(max_html_bytes=40))
    assert "class=" not in r["text"]


def test_extract_links_edge_cases():
    """href parsing: quotes/no-quotes, relative/absolute resolution,
    fragment handling, non-http schemes, broken markup never raises."""
    from bb_ocr_ray.kernel.links import extract_links

    html = (
        '<a href="/rel">a</a>'
        "<a href='also'>b</a>"
        '<a class="x" href=/noquote>c</a>'
        '<a href="https://other.org/abs#frag">d</a>'
        '<a href="#only-fragment">e</a>'
        '<a href="">empty</a>'
        '<a href="mailto:x@y.z">mail</a>'
        '<a href="javascript:void(0)">js</a>'
        '<A HREF="../up">case</A>'
        '<a href="//proto.example.com/p">protorel</a>'
        '<a href="/dup">dup</a><a href="/dup">dup</a>'
        '<a no-href>broken</a><a href=>degenerate'
    )
    base = "https://host.example.com/dir/page"
    got = extract_links(html, base)
    assert got == [
        "https://host.example.com/rel",
        "https://host.example.com/dir/also",
        "https://host.example.com/noquote",
        "https://other.org/abs",          # fragment stripped
        "https://host.example.com/up",    # ../ resolved
        "https://proto.example.com/p",    # protocol-relative
        "https://host.example.com/dup",   # duplicates kept (multiset)
        "https://host.example.com/dup",
    ]
