"""WARC ingestion tests (sparkgraft/warc.py): framing round-trips,
gzip-member layout, record-type filtering, the dead-letter matrix, and
the Arrow operator end-to-end incl. composition with the URL tier."""

from __future__ import annotations

import pytest

from sparkgraft import warc as WC


def _resp(url: str, body: bytes, status: int = 200) -> bytes:
    return WC.build_warc_record(
        "response", WC.build_http_response(status=status, body=body), url=url
    )


def test_warc_round_trip_plain_and_gzip():
    recs = [
        WC.build_warc_record(
            "warcinfo", b"software: test\r\n",
            content_type="application/warc-fields",
        ),
        _resp("http://a.example.com/1", b"hello world"),
        WC.build_warc_record(
            "request", b"GET /1 HTTP/1.1\r\n\r\n", url="http://a.example.com/1",
            content_type="application/http; msgtype=request",
        ),
        _resp("http://a.example.com/2", b"\x00\x01binary body\xff", status=404),
    ]
    for gz in (False, True):
        data = WC.build_warc_file(recs, gzip_members=gz)
        parsed = WC.parse_warc(data)
        assert [r["warc_type"] for r in parsed] == [
            "warcinfo", "response", "request", "response",
        ]
        assert parsed[1]["url"] == "http://a.example.com/1"
        http = WC.parse_http_response(parsed[1]["payload"])
        assert http["status"] == 200 and http["body"] == b"hello world"
        assert http["content_type"] == "text/html"
        http2 = WC.parse_http_response(parsed[3]["payload"])
        assert http2["status"] == 404
        assert http2["body"] == b"\x00\x01binary body\xff"
        # framing is exact: content_length matches the block
        for r in parsed:
            assert r["content_length"] == len(r["payload"])


def test_warc_dead_letter_matrix():
    good = WC.build_warc_file([_resp("http://x/", b"ok")])
    clen = len(WC.build_http_response(body=b"ok"))
    warc_clen = f"Content-Length: {clen}".encode()
    assert warc_clen in good  # the WARC-level framing header
    # every corruption class raises ValueError, never anything else
    cases = [
        good[:-3],                      # truncated terminator
        b"NARC/1.0" + good[8:],         # bad magic
        good.replace(b"WARC/1.0", b"WARC/9.9", 1),   # bad version
        good.replace(warc_clen, f"Content-Length: {clen - 1}".encode(), 1),
        good.replace(warc_clen, b"Content-Length: -1", 1),
        b"\x1f\x8b\x08\x00truncated-gzip",
        good + b"garbage-after-record",
    ]
    for i, data in enumerate(cases):
        with pytest.raises(ValueError):
            WC.parse_warc(data)
        # sanity: the corruptions really differ from the good bytes
        assert data != good, i
    with pytest.raises(NotImplementedError):
        WC.parse_warc(None)
    with pytest.raises(ValueError):
        WC.parse_http_response(b"no separator here")
    with pytest.raises(ValueError):
        WC.parse_http_response(b"NOT-HTTP 200 OK\r\n\r\nbody")


def test_warc_lf_only_http_headers():
    """Some real servers emit LF-only header separators; the HTTP
    splitter tolerates them (the header/body boundary is then LF LF)."""
    block = b"HTTP/1.1 200 OK\nContent-Type: text/plain\n\nbody-bytes"
    http = WC.parse_http_response(block)
    assert http["status"] == 200 and http["body"] == b"body-bytes"
    assert http["content_type"] == "text/plain"


def test_warc_responses_operator_and_url_tier(spark):
    """warc_responses end-to-end: two good files (one gzip-member, one
    plain, requests/warcinfo skipped), one corrupt file dead-lettered
    as a single error row — then the URL gate and canonical dedup
    consume the cracked rows directly (the composition the module
    exists for)."""
    from pyspark.sql import functions as F

    from sparkgraft import web as W

    f1 = WC.build_warc_file(
        [
            WC.build_warc_record(
                "warcinfo", b"software: t\r\n",
                content_type="application/warc-fields",
            ),
            _resp("http://site1.example.com/a", b"body-a"),
            _resp("HTTP://www.site1.example.com/a?utm_source=x", b"body-a2"),
        ],
        gzip_members=True,
    )
    f2 = WC.build_warc_file(
        [
            WC.build_warc_record(
                "request", b"GET /b HTTP/1.1\r\n\r\n",
                url="http://site2.example.com/b",
                content_type="application/http; msgtype=request",
            ),
            _resp("http://site2.example.com/ads/b", b"blocked-by-path"),
        ]
    )
    files = spark.createDataFrame(
        [(1, bytearray(f1)), (2, bytearray(f2)), (3, bytearray(b"not a warc"))],
        "file_id long, payload binary",
    )
    out = WC.warc_responses(files)
    rows = sorted(
        out.collect(), key=lambda r: (r.file_id, r.url or "")
    )
    good = [r for r in rows if r.warc_error is None]
    bad = [r for r in rows if r.warc_error is not None]
    assert len(good) == 3 and len(bad) == 1
    assert bad[0].file_id == 3 and "version line" in bad[0].warc_error
    assert {r.url for r in good} == {
        "http://site1.example.com/a",
        "HTTP://www.site1.example.com/a?utm_source=x",
        "http://site2.example.com/ads/b",
    }
    assert all(r.status == 200 for r in good)
    by_url = {r.url: r for r in good}
    assert bytes(by_url["http://site1.example.com/a"].body) == b"body-a"

    # composition: gate + canonical dedup over the cracked rows
    gated = out.where(F.col("warc_error").isNull()).select(
        "file_id", "url", "n_body_bytes",
        W.url_filter("url")["keep"].alias("keep"),
        W.canonical_url("url").alias("canonical_url"),
    )
    g = {r.url: r for r in gated.collect()}
    assert g["http://site2.example.com/ads/b"].keep is False  # path rule
    # the www/case/utm variant collapses onto the plain URL's key
    assert (
        g["HTTP://www.site1.example.com/a?utm_source=x"].canonical_url
        == g["http://site1.example.com/a"].canonical_url
    )


def test_read_warc_dir_binary_file_source(spark, tmp_path):
    """read_warc_dir: real .warc.gz files on disk through the
    binaryFile source — every response row recovered, the corrupt
    archive dead-lettered per file, nothing killed the scan."""
    (tmp_path / "a.warc.gz").write_bytes(
        WC.build_warc_file(
            [_resp("http://a/1", b"one"), _resp("http://a/2", b"two")],
            gzip_members=True,
        )
    )
    (tmp_path / "b.warc.gz").write_bytes(
        WC.build_warc_file([_resp("http://b/1", b"three")], gzip_members=True)
    )
    (tmp_path / "broken.warc.gz").write_bytes(b"\x1f\x8b\x08\x00nope")
    (tmp_path / "ignored.txt").write_bytes(b"not picked up by the glob")

    out = WC.read_warc_dir(spark, str(tmp_path)).collect()
    good = {r.url: bytes(r.body) for r in out if r.warc_error is None}
    bad = [r for r in out if r.warc_error is not None]
    assert good == {
        "http://a/1": b"one", "http://a/2": b"two", "http://b/1": b"three",
    }
    assert len(bad) == 1 and "gzip" in bad[0].warc_error
    # file_id is stable per file: both a.warc.gz rows share one id
    ids = {r.url: r.file_id for r in out if r.warc_error is None}
    assert ids["http://a/1"] == ids["http://a/2"] != ids["http://b/1"]


def test_warc_tail_recovery(spark):
    """Tail tolerance: an archive whose LAST gzip member (or last
    plain record) is torn still yields every complete record plus one
    dead-letter row; recover=False keeps only the error row. A
    mid-file defect never resynchronizes past itself."""
    recs = [_resp("http://r/1", b"one"), _resp("http://r/2", b"two")]
    import gzip

    torn_gz = (
        gzip.compress(recs[0]) + gzip.compress(recs[1])[:20]
    )  # second member torn
    torn_plain = recs[0] + recs[1][:-3]  # terminator cut

    # parser level
    got, err = WC.parse_warc_recover(torn_gz)
    assert [r["url"] for r in got] == ["http://r/1"] and "gzip" in err
    got, err = WC.parse_warc_recover(torn_plain)
    assert [r["url"] for r in got] == ["http://r/1"] and "terminated" in err
    got, err = WC.parse_warc_recover(WC.build_warc_file(recs))
    assert len(got) == 2 and err is None
    # strict parse_warc still raises, carrying the prefix
    with pytest.raises(ValueError):
        WC.parse_warc(torn_gz)

    # operator level: recovered rows + the error row
    files = spark.createDataFrame(
        [(1, bytearray(torn_gz))], "file_id long, payload binary"
    )
    out = WC.warc_responses(files).collect()
    assert {r.url for r in out if r.warc_error is None} == {"http://r/1"}
    assert sum(1 for r in out if r.warc_error is not None) == 1
    strict = WC.warc_responses(files, recover=False).collect()
    assert len(strict) == 1 and strict[0].warc_error is not None


# ---------------------------------------------------------------- r13
# HTTP body decode tier (VERDICT r12 #1): chunked de-framing,
# Content-Encoding decompression, charset-aware text decode.


def test_dechunk_grammar():
    import pytest

    # chunks with extension tokens and trailers, all per RFC 9112 §7.1
    framed = (
        b"5;ext=1\r\nhello\r\n"
        b"1\r\n \r\n"
        b"5\r\nworld\r\n"
        b"0\r\nTrailer: x\r\n\r\n"
    )
    assert WC.dechunk(framed) == b"hello world"
    assert WC.dechunk(b"0\r\n\r\n") == b""
    for bad in (
        b"5\r\nhell",                  # truncated chunk data
        b"zz\r\nhello\r\n0\r\n\r\n",   # bad size token
        b"5\r\nhelloXX0\r\n\r\n",      # missing chunk CRLF
        b"hello",                      # no size line
    ):
        with pytest.raises(ValueError):
            WC.dechunk(bad)


def test_decompress_http_body_codings():
    import gzip
    import zlib

    import pytest

    body = b"compressible " * 50
    assert WC.decompress_http_body(gzip.compress(body), "gzip") == body
    assert WC.decompress_http_body(gzip.compress(body), "x-gzip") == body
    # deflate: RFC 1950 zlib wrapper AND the wild's raw RFC 1951 stream
    assert WC.decompress_http_body(zlib.compress(body), "deflate") == body
    raw = zlib.compressobj(wbits=-15)
    assert (
        WC.decompress_http_body(raw.compress(body) + raw.flush(), "deflate")
        == body
    )
    assert WC.decompress_http_body(body, "identity") == body
    assert WC.decompress_http_body(body, "") == body
    for enc, data in (
        ("br", body),                              # unsupported coding
        ("gzip", b"\x1f\x8bnot really gzip"),      # corrupt stream
        ("gzip", gzip.compress(body)[:-4]),        # truncated stream
    ):
        with pytest.raises(ValueError):
            WC.decompress_http_body(data, enc)


def test_decode_http_payload_coding_chains():
    import gzip

    body = b"payload bytes " * 20
    # Transfer-Encoding: gzip, chunked  -> de-chunk FIRST, then gunzip
    chunked_gzip = b""
    gz = gzip.compress(body, mtime=0)
    for i in range(0, len(gz), 32):
        chunk = gz[i : i + 32]
        chunked_gzip += f"{len(chunk):x}\r\n".encode() + chunk + b"\r\n"
    chunked_gzip += b"0\r\n\r\n"
    assert (
        WC.decode_http_payload(chunked_gzip, "gzip, chunked", "") == body
    )
    # Content-Encoding chain applied in reverse
    assert WC.decode_http_payload(gz, "", "gzip") == body
    assert WC.decode_http_payload(body, "", "") == body


def test_charset_and_text_decode():
    assert WC.charset_of("text/html; charset=ISO-8859-1") == "iso-8859-1"
    assert WC.charset_of('text/html; charset="utf-8"') == "utf-8"
    assert WC.charset_of("text/html") is None
    # declared charset decodes with replace-errors
    assert WC.decode_text_body(b"caf\xe9", "text/html; charset=latin-1") == "café"
    # declared UTF-8 with a lying byte -> U+FFFD, never an error
    assert "�" in WC.decode_text_body(b"a\xffb", "text/html; charset=utf-8")
    # unknown label falls through to the ladder
    assert WC.decode_text_body(b"abc", "text/html; charset=bogus-9") == "abc"
    # no charset: strict UTF-8 first, then total ISO-8859-1
    assert WC.decode_text_body("héllo".encode("utf-8"), "text/html") == "héllo"
    assert WC.decode_text_body(b"caf\xe9", "text/html") == "café"
    # text-type classification
    assert WC.is_text_content_type("text/plain; charset=utf-8")
    assert WC.is_text_content_type("application/json")
    assert WC.is_text_content_type("application/rss+xml")
    assert not WC.is_text_content_type("image/jpeg")
    assert not WC.is_text_content_type("application/octet-stream")


def test_warc_responses_decodes_wire_encodings(spark):
    """End-to-end through the operator: gzip, chunked, chunked+gzip
    TE chain, ISO-8859-1 charset, a binary type (no text_body), and a
    corrupt gzip body that dead-letters its row alone."""
    import gzip

    page = "<p>hello crawl café</p>"
    l1 = page.encode("iso-8859-1")
    u8 = page.encode("utf-8")
    gz_broken = gzip.compress(u8)[:-5]
    # hand-frame a TE 'gzip, chunked' body
    gz = gzip.compress(u8, mtime=0)
    te_chain = b""
    for i in range(0, len(gz), 16):
        c = gz[i : i + 16]
        te_chain += f"{len(c):x}\r\n".encode() + c + b"\r\n"
    te_chain += b"0\r\n\r\n"
    te_head = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: gzip, chunked\r\n\r\n"
    )
    records = [
        WC.build_warc_record(
            "response", WC.build_http_response(body=u8), url="http://w/plain"
        ),
        WC.build_warc_record(
            "response",
            WC.build_http_response(body=u8, content_encoding="gzip"),
            url="http://w/gz",
        ),
        WC.build_warc_record(
            "response",
            WC.build_http_response(
                body=l1, content_type="text/html; charset=ISO-8859-1",
                chunked=True, chunk_size=7,
            ),
            url="http://w/chunked-l1",
        ),
        WC.build_warc_record(
            "response", te_head + te_chain, url="http://w/te-chain"
        ),
        WC.build_warc_record(
            "response",
            WC.build_http_response(
                body=b"\x89PNG...", content_type="image/png"
            ),
            url="http://w/binary",
        ),
        WC.build_warc_record(
            "response",
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Encoding: gzip\r\n\r\n" + gz_broken,
            url="http://w/broken",
        ),
    ]
    files = spark.createDataFrame(
        [(1, bytearray(WC.build_warc_file(records, gzip_members=True)))],
        "file_id long, payload binary",
    )
    got = {r.url: r for r in WC.warc_responses(files).collect()}
    for u in ("http://w/plain", "http://w/gz", "http://w/chunked-l1",
              "http://w/te-chain"):
        assert got[u].warc_error is None, (u, got[u].warc_error)
        assert got[u].text_body == page, u
    assert bytes(got["http://w/plain"].body) == u8
    assert bytes(got["http://w/gz"].body) == u8
    assert bytes(got["http://w/chunked-l1"].body) == l1
    assert got["http://w/chunked-l1"].n_body_bytes == len(l1)
    b = got["http://w/binary"]
    assert b.warc_error is None and b.text_body is None
    assert bytes(b.body) == b"\x89PNG..."
    bad = got["http://w/broken"]
    assert bad.warc_error is not None and bad.text_body is None
    assert bytes(bad.body) == gz_broken  # raw wire bytes kept
