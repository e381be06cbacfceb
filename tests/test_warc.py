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
