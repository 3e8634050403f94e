"""HTML → text extraction (round 7 continuation) — the FIRST step of
every web-scrape curation pipeline, which the text family (quality
scores, dedup, language ID) implicitly assumed had already happened.

A real parser (stdlib ``html.parser``), not regex stripping: script and
style subtrees are dropped wholly, character references decode
(``&amp;`` → ``&``, ``&#65;`` → ``A``), comments vanish, block-level
tags introduce line breaks while inline tags do not, and whitespace is
normalized per block. Deterministic by construction, so the
text_html_extraction oracle can recompute the EXPECTED extraction of a
synthesized page (with planted entities, a script/style/comment payload
that must NOT leak, and inline-vs-block structure) directly from the
source columns — an extractor that leaks script text, drops a
paragraph, or mis-decodes an entity breaks the md5.

At 100 TB: mapInPandas over the raw-HTML column, embarrassingly
parallel; the extracted text feeds the existing quality/dedup/langid
operators. Reference provenance: beyond-reference [NS] (text family).
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import DataFrame

# Tags whose content is dropped entirely.
_SKIP_SUBTREE = {"script", "style"}

# Tags that terminate a text run with a line break. Everything else
# (span, a, b, i, em, strong, code, ...) is inline.
_BLOCK_TAGS = {
    "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul",
    "ol", "table", "tr", "td", "th", "title", "head", "body", "html",
    "section", "article", "header", "footer", "blockquote", "pre",
}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)  # entities decode to text
        self._skip_depth = 0
        self._chunks: list[str] = []  # current block's text pieces
        self._lines: list[str] = []

    def _flush_block(self) -> None:
        text = " ".join("".join(self._chunks).split())  # collapse ws
        self._chunks = []
        if text:
            self._lines.append(text)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_SUBTREE:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush_block()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_SUBTREE:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush_block()

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self._chunks.append(data)

    def result(self) -> str:
        self._flush_block()
        return "\n".join(self._lines)


def extract_text(html: str) -> str:
    """Extract visible text: one line per block-level run, inline tags
    transparent, script/style/comments dropped, entities decoded,
    whitespace collapsed within each block."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.result()


def html_text_extract(
    df: DataFrame, key_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Arrow-batched extraction over an HTML string column: emits the
    extracted text plus the md5/length the differential layer compares."""
    schema = f"{key_col} long, extracted string, n_chars long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                text = extract_text(str(r[html_col]))
                rows.append((r[key_col], text, len(text)))
            yield pd.DataFrame(rows, columns=[key_col, "extracted", "n_chars"])

    return df.select(key_col, html_col).mapInPandas(run, schema)
