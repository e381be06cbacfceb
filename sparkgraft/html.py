"""HTML -> text extraction — the step between a cracked crawl archive
(warc.py response bodies) and the documents table every other tier
consumes: strip markup, drop script/style/template payloads, decode
entities, normalize whitespace; plus title and outlink extraction (the
outlinks ARE the crawl frontier, and they feed straight into the
web.py URL gate/canonicalizer).

The reference (`/root/reference/event_verify.py`) has no HTML surface;
extension module per the brief's training-data-pipeline mandate,
stdlib-only (``html.parser`` — an event-driven tokenizer that survives
the real web's unclosed tags and attribute soup, where a regex
stripper silently corrupts).

Scale shape: all three extractors are row-local Python over Arrow
batches (``mapInPandas`` — never row-at-a-time ``BatchEvalPython``),
the same seam as the codec tier: one pass, no shuffle, a malformed
document dead-letters as NULL instead of killing the scan.

Whitespace contract (what the oracle reproduces): every whitespace run
collapses to one space and the result is stripped — a deterministic,
SQL-expressible normal form (``regexp_replace(x, '\\s+', ' ')`` +
``trim``), chosen over prettier paragraph layouts precisely so the
extraction is oracle-checkable end to end.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator

from pyspark.sql import DataFrame

__all__ = [
    "html_to_text",
    "html_title",
    "html_links",
    "extract_html",
    "HTML_EXTRACT_SCHEMA",
]

# content of these elements is code/metadata, never training text
_SKIP_ELEMENTS = frozenset(
    {"script", "style", "noscript", "template", "head", "svg", "iframe"}
)
# void elements never get a closing tag — they must not open a skip
# scope or imbalance the depth counter (area/base/br/col/embed/hr/img/
# input/link/meta/param/source/track/wbr per the HTML spec)
_VOID_ELEMENTS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"}
)

# HTML's "ASCII whitespace" set EXACTLY — space/tab/LF/FF/CR, NOT \v
# (ADVICE r12: \v is in neither the HTML spec's set nor RE2/DuckDB's
# \s, so including it made a \x0b document normalize differently in
# Spark vs the DuckDB oracle's regexp_replace('\s+')), and NOT
# Python's unicode-aware \s. A \v or unicode space passes through
# verbatim on every engine.
_WS = re.compile(r"[ \t\n\r\f]+")


def _norm(s: str) -> str:
    """The documented whitespace normal form: ASCII-whitespace runs ->
    one space, then edge SPACES stripped. ``.strip(" ")``, not bare
    ``.strip()`` — after the run-collapse the only ASCII whitespace
    left at the edges IS a space, and bare strip() would also eat a
    leading/trailing \\v or unicode space that DuckDB's ``trim`` (and
    Spark's) keeps."""
    return _WS.sub(" ", s).strip(" ")


class _Extractor(HTMLParser):
    """One pass, three products: visible text chunks, the <title>, and
    every <a href>. ``convert_charrefs=True`` (the default) makes the
    parser hand over entity-decoded text, so ``&amp;`` arrives as
    ``&`` with no second unescape pass."""

    def __init__(self) -> None:
        super().__init__()
        self.chunks: list[str] = []
        self.links: list[str] = []
        self.title: str | None = None
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_ELEMENTS:
            if tag == "img":
                for k, v in attrs:
                    if k == "alt" and v:
                        self.chunks.append(v)
            return
        if tag in _SKIP_ELEMENTS:
            self._skip_depth += 1
        elif tag == "title":
            self._in_title = True
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)

    def handle_endtag(self, tag):
        if tag in _SKIP_ELEMENTS and self._skip_depth > 0:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._in_title:
            self.title = (self.title or "") + data
        elif self._skip_depth == 0 and data:
            self.chunks.append(data)


def _parse(html: str) -> _Extractor:
    p = _Extractor()
    p.feed(html)
    p.close()
    return p


def html_to_text(html: str) -> str:
    """Visible text of an HTML document: markup stripped,
    script/style/head/template content dropped, img alt text kept,
    entities decoded, whitespace normalized to the single-space form
    (see module docstring). Tolerates the real web's tag soup — the
    stdlib parser never raises on imbalance, it just keeps going."""
    return _norm(" ".join(_parse(html).chunks))


def html_title(html: str) -> str | None:
    """The <title> content (whitespace-normalized), or None."""
    t = _parse(html).title
    return _norm(t) if t is not None else None


def html_links(html: str) -> list[str]:
    """Every ``<a href>`` value in document order, duplicates kept —
    the raw outlink frontier; resolve/gate/canonicalize downstream
    with the web.py tier."""
    return _parse(html).links


HTML_EXTRACT_SCHEMA = (
    "doc_id long, text string, title string, links array<string>"
)


def extract_html(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """All three extractions in ONE Arrow pass over ``(id, html)``
    rows -> ``(doc_id, text, title, links)``. NULL html dead-letters
    as an all-NULL row (the codec convention); the parser itself never
    raises on malformed markup. Compose: ``warc.warc_responses`` ->
    decode bodies -> this -> the text-quality / dedup tiers, with
    ``links`` feeding the URL gate as the next crawl frontier."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, texts, titles, links = [], [], [], []
            for did, html in zip(pdf[id_col], pdf[html_col]):
                ids.append(int(did))
                if html is None:
                    texts.append(None)
                    titles.append(None)
                    links.append(None)
                    continue
                p = _parse(str(html))
                texts.append(_norm(" ".join(p.chunks)))
                titles.append(
                    _norm(p.title) if p.title is not None else None
                )
                links.append(p.links)
            yield pd.DataFrame(
                {"doc_id": ids, "text": texts, "title": titles,
                 "links": links}
            )

    return docs.select(id_col, html_col).mapInPandas(
        run, HTML_EXTRACT_SCHEMA
    )
