"""HTML -> text extraction with a byte-identical-per-url invariant.

The synthetic pages table stores both `html` (binary) and `text`; the
engine must re-extract `text` from `html` byte-for-byte (BASELINE.json
input_hint).  The fixture HTML is:

    <html><head><title>{title}</title></head><body>{s1}. {s2}. ... {sn}.</body></html>

and the extraction contract is:

    text = title + "\\n" + body with every ". " turned into ".\\n"

Twins:
- `extract_text_cols`: Spark Column expressions (decode + regexp_extract
  + replace) — JVM-side, no Python.
- `extract_text_np`: vectorized pandas string kernels (oracle + datagen).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_TITLE_RE = "<title>(.*?)</title>"
_BODY_RE = "<body>(.*?)</body>"


def _first_between(s: Column, open_tag: str, close_tag: str) -> Column:
    """Text between the FIRST `open_tag` and the next `close_tag`
    ('' when either is absent) — plain indexOf + substring, no regex.

    Equivalent to regexp_extract(s, open_tag + '(.*?)' + close_tag, 1)
    on the corpus contract (render_html_np: one occurrence per tag, no
    newline inside a tag span; the lazy-dot regex and first-indexOf
    agree everywhere except regex's refusal to cross '\\n').  The
    regex form was the scaling pipeline's allocation hot spot: two
    java.util.regex lazy-dot matchers per page allocate Matcher +
    backtracking state per row, and at 32 threads on one local-mode
    heap the GC overhead grows superlinearly with width — indexOf
    keeps the stage in zero-garbage codegen."""
    p = F.locate(open_tag, s)  # 1-based; 0 when absent
    start = p + len(open_tag)
    # first close tag anywhere: on the contract input it can only sit
    # after the first open tag, and the q < start guard rejects the
    # malformed orderings instead of emitting a negative-length slice
    q = F.locate(close_tag, s)
    return F.when(
        (p > 0) & (q >= start), F.substr(s, start, q - start)
    ).otherwise(F.lit(""))


def extract_text_cols(html: Column) -> Column:
    """html binary column -> extracted text column (pure JVM expressions)."""
    s = F.decode(html, "UTF-8")
    title = _first_between(s, "<title>", "</title>")
    body = _first_between(s, "<body>", "</body>")
    return F.concat(title, F.lit("\n"), F.replace(body, F.lit(". "), F.lit(".\n")))


def extract_text_np(html: pd.Series) -> pd.Series:
    """Twin of extract_text_cols (vectorized pandas, no per-row Python)."""
    s = html.map(lambda b: b.decode("utf-8") if isinstance(b, (bytes, bytearray)) else b)
    title = s.str.extract(_TITLE_RE, expand=False)
    body = s.str.extract(_BODY_RE, expand=False)
    return title + "\n" + body.str.replace(". ", ".\n", regex=False)


def render_html_np(titles: pd.Series, bodies: pd.Series) -> pd.Series:
    """Render the fixture HTML (datagen side)."""
    return (
        "<html><head><title>"
        + titles
        + "</title></head><body>"
        + bodies
        + "</body></html>"
    )
