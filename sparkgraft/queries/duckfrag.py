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

# Distinct word 3-shingles over a `tok` VARCHAR[] column (mirrors
# dedup.word_shingles k=3 — docs shorter than 3 tokens yield their full
# token join as one shingle, empty docs yield []).
SHINGLES_K3 = (
    "CASE WHEN len(tok) = 0 THEN []::VARCHAR[] ELSE list_distinct("
    "list_transform(range(1, greatest(len(tok) - 2, 1) + 1), "
    "i -> array_to_string(tok[i:i+2], ' '))) END"
)
