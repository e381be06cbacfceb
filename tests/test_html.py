"""HTML extraction tests (sparkgraft/html.py): skip scopes, void
elements, entities, tag soup, the three products, and the Arrow
operator's dead-letter contract."""

from __future__ import annotations

from sparkgraft import html as H


def test_html_to_text_core_rules():
    page = (
        "<html><head><title>T &amp; t</title><style>p {c}</style>"
        '<meta charset="utf-8"></head>'
        "<body><h1>Head</h1><p>one <b>two</b> three</p>"
        "<script>var s = '<p>never</p>';</script>"
        "<noscript>also never</noscript>"
        '<img alt="a picture"><br><hr>'
        "<p>&lt;tag&gt; &amp; &#65;&nbsp;end</p></body></html>"
    )
    # head content (incl. title/style) dropped, script/noscript
    # dropped, img alt kept, entities decoded (named, numeric, nbsp)
    got = H.html_to_text(page)
    assert got == "Head one two three a picture <tag> & A\xa0end"
    assert H.html_title(page) == "T & t"


def test_html_to_text_whitespace_normal_form():
    # ASCII whitespace runs collapse to one space; non-breaking space
    # (U+00A0) is NOT ASCII whitespace and survives — the documented
    # RE2/Java-reproducible normal form
    assert H.html_to_text("<p>  a\n\t b </p>\r\n<p>c</p>") == "a b c"
    assert H.html_to_text("<p>a\xa0b</p>") == "a\xa0b"


def test_html_tag_soup_never_raises():
    cases = [
        "<p>unclosed <b>bold",
        "</div></div>stray closers<p>text",
        "<p unterminated attr='x",
        "<<<>>>",
        "",
        "plain text, no tags at all",
        "<script>never closed so the scope runs out",
    ]
    for c in cases:
        H.html_to_text(c)  # must not raise
    assert H.html_to_text("<p>unclosed <b>bold") == "unclosed bold"
    # an unclosed skip element swallows the rest of the document —
    # correct per the parser's scope model (script content IS script)
    assert H.html_to_text("<script>x<p>gone") == ""
    # void elements must not open scopes or eat following text
    assert H.html_to_text("a<br>b<img>c<hr>d") == "a b c d"


def test_html_links_order_and_duplicates():
    page = (
        '<a href="/one">1</a><a name="anchor">no href</a>'
        '<a href="/two">2</a><a href="/one">1 again</a>'
        '<area href="/ignored-void-still-counts?">'
    )
    assert H.html_links(page) == ["/one", "/two", "/one"]
    assert H.html_links("<p>no links</p>") == []


def test_extract_html_operator_dead_letters_null(spark):
    rows = [
        (1, "<html><head><title>t1</title></head><body>"
            '<p>alpha</p><a href="/a">x</a></body></html>'),
        (2, None),
        (3, "<p>beta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r.doc_id: r for r in H.extract_html(df).collect()}
    assert got[1].text == "alpha x" and got[1].title == "t1"
    assert list(got[1].links) == ["/a"]
    assert got[2].text is None and got[2].title is None and got[2].links is None
    assert got[3].text == "beta" and got[3].title is None
    assert list(got[3].links) == []


def test_warc_to_html_to_text_composition(spark):
    """The full crawl-to-corpus chain: WARC file -> cracked response
    -> decoded body -> extracted text + frontier links -> URL gate.
    Every stage is an operator from this engine; this is the pipeline
    the ingestion tier exists for."""
    from pyspark.sql import functions as F

    from sparkgraft import warc as WC
    from sparkgraft import web as W

    page = (
        "<html><head><title>Page</title></head><body><p>hello crawl</p>"
        '<a href="https://next.example.com/b?utm_source=x">more</a>'
        "</body></html>"
    ).encode()
    f = WC.build_warc_file(
        [WC.build_warc_record(
            "response", WC.build_http_response(body=page),
            url="https://site.example.com/a",
        )],
        gzip_members=True,
    )
    files = spark.createDataFrame(
        [(1, bytearray(f))], "file_id long, payload binary"
    )
    responses = WC.warc_responses(files).where(F.col("warc_error").isNull())
    pages = responses.select(
        F.col("file_id").alias("doc_id"),
        F.decode(F.col("body"), "UTF-8").alias("html"),
    )
    out = H.extract_html(pages)
    row = out.collect()[0]
    assert row.text == "hello crawl more"
    assert row.title == "Page"
    frontier = (
        out.select(F.explode("links").alias("url"))
        .select(
            "url",
            W.url_filter("url")["keep"].alias("keep"),
            W.canonical_url("url").alias("canonical_url"),
        )
        .collect()
    )
    assert frontier[0].keep is True
    assert frontier[0].canonical_url == "https://next.example.com/b"
