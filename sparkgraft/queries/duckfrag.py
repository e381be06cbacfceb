"""Shared DuckDB oracle fragments (no query registration here — this
module must stay import-side-effect-free so query modules can share
fragments without perturbing the registration-priority order that
queries/__init__.py documents)."""

from __future__ import annotations

# Whitespace tokens of normalized text (mirrors text.tokens — note the
# 'g' flag: DuckDB regexp_replace is first-match-only by default,
# Spark's is global). NULL/empty text -> empty VARCHAR list.
TOK = (
    "CASE WHEN text IS NULL OR trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) = '' "
    "THEN []::VARCHAR[] "
    "ELSE string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') END"
)

# English stopword list literal (mirrors text.STOPWORDS['en']).
EN_STOP = "['the','a','and','of','to','in','is','it','you','that']"
