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
    -> decoded body (all three wire encodings: identity, gzip
    Content-Encoding, chunked Transfer-Encoding + ISO-8859-1 charset —
    r13, VERDICT r12 #1) -> extracted text + frontier links -> URL
    gate. Every stage is an operator from this engine; this is the
    pipeline the ingestion tier exists for."""
    from pyspark.sql import functions as F

    from sparkgraft import warc as WC
    from sparkgraft import web as W

    def page(n: int, body_text: str) -> str:
        return (
            f"<html><head><title>Page {n}</title></head>"
            f"<body><p>{body_text}</p>"
            f'<a href="https://next.example.com/{n}?utm_source=x">more</a>'
            "</body></html>"
        )

    records = [
        WC.build_warc_record(
            "response",
            WC.build_http_response(body=page(1, "hello crawl").encode()),
            url="https://site.example.com/1",
        ),
        WC.build_warc_record(
            "response",
            WC.build_http_response(
                body=page(2, "gzipped crawl").encode(),
                content_encoding="gzip",
            ),
            url="https://site.example.com/2",
        ),
        WC.build_warc_record(
            "response",
            WC.build_http_response(
                body=page(3, "café crawl").encode("iso-8859-1"),
                content_type="text/html; charset=ISO-8859-1",
                chunked=True, chunk_size=13,
            ),
            url="https://site.example.com/3",
        ),
    ]
    f = WC.build_warc_file(records, gzip_members=True)
    files = spark.createDataFrame(
        [(1, bytearray(f))], "file_id long, payload binary"
    )
    responses = WC.warc_responses(files).where(F.col("warc_error").isNull())
    pages = responses.select(
        F.regexp_extract("url", r"/(\d+)$", 1).cast("long").alias("doc_id"),
        F.col("text_body").alias("html"),
    )
    out = H.extract_html(pages)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].text == "hello crawl more" and rows[1].title == "Page 1"
    assert rows[2].text == "gzipped crawl more" and rows[2].title == "Page 2"
    assert rows[3].text == "café crawl more" and rows[3].title == "Page 3"
    frontier = (
        out.select(F.explode("links").alias("url"))
        .select(
            "url",
            W.url_filter("url")["keep"].alias("keep"),
            W.canonical_url("url").alias("canonical_url"),
        )
        .orderBy("canonical_url")
        .collect()
    )
    assert all(r.keep is True for r in frontier)
    assert [r.canonical_url for r in frontier] == [
        f"https://next.example.com/{n}" for n in (1, 2, 3)
    ]


def test_html_base_href_and_resolve_links():
    """<base href> capture (first wins, per the HTML spec) and the
    frontier resolution helper: base href is itself resolved against
    the record URL before the links resolve against it."""
    page = (
        '<html><head><base href="/base/dir/"><base href="/second/">'
        '</head><body><a href="rel/x">r</a><a href="../up">u</a>'
        '<a href="https://abs.example.com/a">a</a></body></html>'
    )
    assert H.html_base_href(page) == "/base/dir/"
    assert H.html_base_href("<p>no base</p>") is None
    got = H.resolve_links(
        "http://site.example.com/a/b/page.html",
        H.html_links(page),
        H.html_base_href(page),
    )
    assert got == [
        "http://site.example.com/base/dir/rel/x",
        "http://site.example.com/base/up",
        "https://abs.example.com/a",
    ]
    # relative base href resolves against the record URL first
    assert H.resolve_links(
        "http://s.example.com/d1/d2/p.html", ["x"], "sub/"
    ) == ["http://s.example.com/d1/d2/sub/x"]
    # no base element: the record URL is the base
    assert H.resolve_links(
        "http://s.example.com/d1/p.html", ["x", "/y", "//h.example.com/z"]
    ) == [
        "http://s.example.com/d1/x",
        "http://s.example.com/y",
        "http://h.example.com/z",
    ]
    # no record URL: nothing to resolve against
    assert H.resolve_links(None, ["a/b"], "/base/") == ["a/b"]


def test_extract_html_resolved_operator(spark):
    """extract_html(url_col=...): the same Arrow pass emits the
    record URL, base_href, and RFC-3986-resolved frontier; NULL html
    and NULL url dead-letter per the codec convention."""
    from pyspark.sql import functions as F

    rows = [
        (1, "http://a.example.com/d/p.html",
         '<a href="x">1</a><a href="../y?q=1#f">2</a>'),
        (2, "http://b.example.com/d/p.html",
         '<head><base href="http://cdn.example.com/lib/"></head>'
         '<a href="x">1</a>'),
        (3, "http://c.example.com/p.html", None),
        (4, None, '<a href="rel">r</a>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    out = {r.doc_id: r for r in H.extract_html(df, url_col="url").collect()}
    assert list(out[1].resolved_links) == [
        "http://a.example.com/d/x", "http://a.example.com/y?q=1#f",
    ]
    assert out[2].base_href == "http://cdn.example.com/lib/"
    assert list(out[2].resolved_links) == ["http://cdn.example.com/lib/x"]
    assert out[3].resolved_links is None and out[3].text is None
    assert list(out[4].resolved_links) == ["rel"]  # unresolvable: raw
    # the unresolved shape still carries base_href
    out5 = H.extract_html(
        df.where(F.col("html").isNotNull()).drop("url")
    ).collect()
    assert {tuple(r.links or []) for r in out5} == {("x", "../y?q=1#f"), ("x",), ("rel",)}


def test_html_multilingual_normal_form():
    """r13 (VERDICT r12 #7): with the charset decode tier the corpus
    is no longer ASCII-by-construction — the extractor's whitespace
    normal form must match the DuckDB oracle form
    (trim(regexp_replace(x,'\\s+',' ','g'))) on NON-ASCII pages:
    CJK (no spaces), accented Latin, &nbsp; (U+00A0), ideographic
    space (U+3000), and \\x0b — none of which are ASCII whitespace in
    either engine."""
    import duckdb

    cases = [
        "東京は日本の首都です",          # CJK, zero whitespace
        "Zürich café naïve Grüße",
        "a\u00a0b\u00a0c",            # no-break space survives
        "漢字\u3000かな",              # ideographic space survives
        "x\x0by z",                      # \v survives (HTML spec set)
        "mixed 東京 text  with\truns",
    ]
    for raw in cases:
        page = f"<html><body><p>{raw}</p></body></html>"
        got = H.html_to_text(page)
        want = duckdb.sql(
            "SELECT trim(regexp_replace(?, '\\s+', ' ', 'g'))",
            params=[raw],
        ).fetchone()[0]
        assert got == want, (raw, got, want)


def test_html_meta_signals():
    """r13: rel=canonical (token-list match, first wins), meta
    robots, meta description — the page-level curation signals."""
    page = (
        '<html><head><link rel="stylesheet" href="/css">'
        '<link rel="Alternate CANONICAL" href="https://e.com/canon">'
        '<link rel="canonical" href="https://e.com/second">'
        '<meta name="ROBOTS" content="noindex, nofollow">'
        '<meta name="description" content="a page">'
        '<meta name="description" content="dup ignored">'
        "</head><body>x</body></html>"
    )
    m = H.html_meta(page)
    assert m["canonical_href"] == "https://e.com/canon"  # token + first wins
    assert m["meta_robots"] == "noindex, nofollow"
    assert m["meta_description"] == "a page"
    none = H.html_meta("<p>plain</p>")
    assert none == {
        "canonical_href": None, "meta_robots": None,
        "meta_description": None,
    }
    # rel without the canonical token never matches
    assert H.html_meta('<link rel="canonical-ish" href="/x">')[
        "canonical_href"
    ] is None


def test_extract_html_meta_columns(spark):
    rows = [
        (1, '<head><link rel="canonical" href="/canon/1">'
            '<meta name="robots" content="noindex"></head><p>t</p>'),
        (2, "<p>no meta</p>"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r.doc_id: r for r in H.extract_html(df).collect()}
    assert got[1].canonical_href == "/canon/1"
    assert got[1].meta_robots == "noindex"
    assert got[2].canonical_href is None and got[2].meta_robots is None
    assert got[3].meta_description is None
