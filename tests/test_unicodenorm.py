"""Unicode normalization tier (sparkgraft/unicodenorm.py): UAX #15
forms as Arrow UDFs, DuckDB parity for NFC, and the planted
composed/decomposed matrix."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkgraft import unicodenorm as U

# (label, input, expected NFC) — explicit escapes so no tool in the
# edit chain can silently re-normalize the fixtures
MATRIX = [
    ("acute", "cafe\u0301", "caf\u00e9"),
    ("ring", "A\u030a", "\u00c5"),
    # U+212B ANGSTROM SIGN is a singleton: NFC rewrites it to U+00C5
    ("angstrom-sign", "\u212b", "\u00c5"),
    ("hangul-jamo", "\u1100\u1161\u11a8", "\uac01"),
    # combining marks in non-canonical order: NFC must reorder+compose
    ("multi-mark", "s\u0307\u0323", "\u1e69"),
    ("already-nfc", "caf\u00e9", "caf\u00e9"),
    ("ascii", "plain ascii", "plain ascii"),
    ("empty", "", ""),
    # NFC does NOT touch compatibility chars (that's NFKC's job)
    ("ligature-stays", "\ufb01n", "\ufb01n"),
]


def test_nfc_matrix_and_nulls(spark):
    df = spark.createDataFrame(
        [(lbl, s) for lbl, s, _ in MATRIX] + [("null", None)],
        "lbl string, s string",
    )
    out = {r.lbl: r.n for r in df.select("lbl", U.nfc_text("s").alias("n")).collect()}
    for lbl, _, want in MATRIX:
        assert out[lbl] == want, lbl
    assert out["null"] is None


def test_nfc_agrees_with_duckdb_on_matrix():
    con = duckdb.connect()
    for lbl, s, want in MATRIX:
        got = con.execute("select nfc_normalize(?)", [s]).fetchone()[0]
        assert got == want == unicodedata.normalize("NFC", s), lbl


def test_nfd_roundtrip(spark):
    df = spark.createDataFrame([(s,) for _, s, _ in MATRIX], "s string")
    rows = df.select(
        "s",
        U.nfd_text("s").alias("d"),
        U.nfc_text(U.nfd_text("s")).alias("roundtrip"),
    ).collect()
    for r in rows:
        assert r.d == unicodedata.normalize("NFD", r.s)
        # NFC(NFD(x)) == NFC(x): both forms canonical-equivalent
        assert r.roundtrip == unicodedata.normalize("NFC", r.s)


def test_nfkc_casefold(spark):
    cases = [
        ("\ufb01n", "fin"),                  # ligature folds
        ("FIN", "fin"),                       # case folds
        ("\uff26\uff29\uff2e", "fin"),     # fullwidth folds
        ("stra\u1e9ee", "strasse"),          # cap sharp s folds to 'ss'
        ("caf\u00e9", "caf\u00e9"),
        (None, None),
    ]
    df = spark.createDataFrame(cases, "s string, want string")
    for r in df.select(U.nfkc_casefold("s").alias("k"), "want").collect():
        assert r.k == r.want


@pytest.mark.parametrize("fn", [U.nfc_text, U.nfd_text, U.nfkc_casefold])
def test_idempotent(spark, fn):
    df = spark.createDataFrame([(s,) for _, s, _ in MATRIX], "s string")
    rows = df.select(fn("s").alias("a"), fn(fn("s")).alias("b")).collect()
    assert all(r.a == r.b for r in rows)


def test_nfc_skips_normal_input_fast_path(spark, sf_dir):
    # real corpus text through the UDF must round-trip losslessly when
    # already normal (the common case the short-circuit serves)
    from sparkgraft.io import read_table

    docs = read_table(spark, sf_dir, "documents").limit(50)
    rows = docs.select(
        "text", U.nfc_text("text").alias("n")
    ).collect()
    for r in rows:
        want = None if r.text is None else unicodedata.normalize("NFC", r.text)
        assert r.n == want
