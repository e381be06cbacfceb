"""Unicode normalization for text-keyed dedup (UAX #15).

The same user-visible string has many byte encodings: ``café`` ends
composed (``U+00E9``) or decomposed (``e`` + combining ``U+0301``)
depending on the OS, editor, or crawler that produced it — so any
exact- or hash-keyed dedup (``dedup.dedup_exact``,
``web.canonical_url``-style keying, shingle fingerprints) silently
treats equal texts as distinct until keys are put in a canonical
form.  This module supplies that form:

- :func:`nfc_text` — NFC (canonical composition), the W3C-recommended
  interchange form and the right dedup key: it changes bytes ONLY for
  canonically-equivalent spellings, never meaning;
- :func:`nfd_text` — NFD (canonical decomposition), the analysis form
  (strip-accents pipelines match combining marks off NFD);
- :func:`nfkc_casefold` — NFKC + casefold, the aggressive
  identifier/near-key form (folds ligatures, width variants, and
  case: ``ﬁn`` == ``FIN``) — useful for fuzzy keys, too lossy for
  canonical text.

There is no JVM-side normalize in Spark SQL, so these are Arrow-batched
pandas UDFs over ``unicodedata`` (the slow-path exception text.py's
no-UDF rule allows when built-ins genuinely can't express the
semantics).  Scale shape: row-local, rides the scan, no shuffle; the
Python cost is one C-implemented ``unicodedata.normalize`` call per
value, and values already in normal form short-circuit via
``unicodedata.is_normalized`` (the overwhelmingly common case on real
corpora, making the pass nearly free).

Oracle parity: Python's ``unicodedata`` and DuckDB's
``nfc_normalize`` both implement UAX #15 over the same UCD, so NFC
keys are engine-portable and hash-checkable (asserted over the real
corpus plus a planted composed/decomposed matrix in the
``nfc_canonical_dedup`` retired query).  NFKC-casefold has no DuckDB
twin — it stays a pytest-verified op, out of the oracle surface.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

__all__ = ["nfc_text", "nfd_text", "nfkc_casefold"]


def _norm_udf(form: str, casefold: bool = False):
    @F.pandas_udf(StringType())
    def norm(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            if not casefold and unicodedata.is_normalized(form, v):
                return v  # already normal: skip the rebuild
            out = unicodedata.normalize(form, v)
            if casefold:
                # full case folding then re-normalize: folding can
                # denormalize (e.g. U+1E9E -> 'ss'), and UAX #15
                # defines nfkc_casefold as NFKC(casefold(NFKC(x)))
                out = unicodedata.normalize(form, out.casefold())
            return out

        return s.map(one)

    return norm


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def nfc_text(text: Column | str) -> Column:
    """Canonical-composition (NFC) view of a string column — the
    canonical dedup key form. NULL-safe; idempotent."""
    return _norm_udf("NFC")(_col(text))


def nfd_text(text: Column | str) -> Column:
    """Canonical-decomposition (NFD) view — the analysis form (combining
    marks split out, e.g. for accent stripping). NULL-safe; idempotent."""
    return _norm_udf("NFD")(_col(text))


def nfkc_casefold(text: Column | str) -> Column:
    """NFKC + full casefold + NFKC — the aggressive fuzzy-key form
    (ligatures, width variants, and case all fold). NULL-safe;
    idempotent. Not oracle-paired: DuckDB has no NFKC builtin."""
    return _norm_udf("NFKC", casefold=True)(_col(text))
