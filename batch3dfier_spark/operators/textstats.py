"""Text analysis for the training-data pipeline: language-ID, quality
scoring, token counting, document fingerprinting.

Execution shape (revised in round 4): the scalar helpers that stay hot
in JVM whole-stage codegen (token_count — plain split/size/when, no
lambdas) remain Column expressions; everything that previously needed
JVM higher-order-function LAMBDAS (F.filter/transform/aggregate for
stopword counts, language hits, and the rolling fingerprint) now runs
in ONE Arrow-batched kernel.  Round-3 discovery: HOF lambdas defeat
Spark's codegen cache — EVERY fresh plan containing them pays seconds
of janino compilation (that one-time cost dominated dedup_ngram at
4.6 s wall for 0.5 s of work), which is a landmine for a fleet
submitting fresh plans.  The kernel outputs are exact integers or
exact-integer ratios, so the DuckDB SQL twins reproduce them
bit-for-bit; ratio rounding is half-away-from-zero (floor(|x|*1e6+.5)),
the same rule C/DuckDB ROUND applies to doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "add_textstats",
    "repetition_stats",
    "scrub_pii",
]

# language marker words (tiny stopword lists; the n-gram-heuristic
# language-ID analog — deterministic and SQL-expressible)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "nl": ["de", "het", "een", "van", "en"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})

FP_MOD = 2_147_483_648  # 2^31: rolling-hash modulus (ANSI-safe)
FP_MUL = 31

# ASCII whitespace class — matches Java \s (Spark) and RE2 \s (DuckDB)
# exactly; python's own \s would additionally match unicode spaces and
# silently diverge from the SQL twin on non-ASCII corpora
_WS_RE = r"[ \t\n\x0b\f\r]+"
_PUNCT = set(".,;:!?")


def _tokens(text: Column) -> Column:
    # empty-safe whitespace tokenization; identical semantics to
    # regexp_split_to_array in the oracle after the same trim+guard
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for blank text).  Pure JVM — split/
    size/when are ordinary expressions (no HOF lambdas), so this stays
    inside whole-stage codegen for filter pushdown in pipelines."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(_tokens(text))
    )


def _py_tokens(text: str) -> list[str]:
    """The SQL twin's tokenization, in python: TRIM strips SPACES (like
    DuckDB TRIM), then split on the ASCII whitespace class."""
    import re

    t = text.strip(" ")
    if not t:
        return []
    return re.split(_WS_RE, t)


def _round6(x: float) -> float:
    """round(x, 6) half-away-from-zero on the binary double — the rule
    DuckDB ROUND applies; inputs here are quotients of exact ints."""
    import math

    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def add_textstats(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Attach the full textstats column family in ONE Arrow kernel:
    n_chars, n_tokens, punct/alpha/stopword ratios, avg token length,
    per-language marker hits + arg-max prediction (tie-break: language
    name ascending), and the order-sensitive rolling fingerprint
    fold((acc*31 + int(sha256(tok)[:15hex])) mod 2^31).

    Cross-engine exactness: every count is an integer, every ratio one
    IEEE division of exact integers rounded half-away at 1e-6, and the
    fingerprint is pure int arithmetic — so the DuckDB twin
    (plans/queries._sql_textstats) reproduces all values bit-for-bit.
    Per-token sha256 is memoized per batch (web text repeats words
    heavily, so unique-token hashing is a small fraction of token
    count)."""
    import hashlib
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    langs_sorted = sorted(LANG_MARKERS)  # argmax scan order (de,en,fr,nl)
    marker_sets = {lg: set(ws) for lg, ws in LANG_MARKERS.items()}
    stop_set = set(STOPWORDS)

    new_fields = [
        StructField("n_chars", LongType()),
        StructField("n_tokens", LongType()),
        StructField("punct_ratio", DoubleType()),
        StructField("alpha_ratio", DoubleType()),
        StructField("stopword_ratio", DoubleType()),
        StructField("avg_token_len", DoubleType()),
        StructField("hits_en", LongType()),
        StructField("hits_nl", LongType()),
        StructField("hits_de", LongType()),
        StructField("hits_fr", LongType()),
        StructField("lang_pred", StringType()),
        StructField("fingerprint", LongType()),
    ]
    # withColumns semantics: a stat column REPLACES an input column of
    # the same name in place (e.g. the documents table's own n_chars);
    # genuinely new columns append in order
    by_name = {f.name: f for f in new_fields}
    fields = [by_name.pop(f.name, f) for f in df.schema.fields]
    out_schema = StructType(
        fields + [f for f in new_fields if f.name in by_name]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sha_memo: dict[str, int] = {}

        def tok_hash(w: str) -> int:
            h = sha_memo.get(w)
            if h is None:
                h = int(hashlib.sha256(w.encode("utf-8")).hexdigest()[:15], 16)
                sha_memo[w] = h
            return h

        for pdf in batches:
            cols: dict[str, list] = {
                k: [] for k in (
                    "n_chars", "n_tokens", "punct_ratio", "alpha_ratio",
                    "stopword_ratio", "avg_token_len", "hits_en", "hits_nl",
                    "hits_de", "hits_fr", "lang_pred", "fingerprint",
                )
            }
            for txt in pdf[text_col]:
                txt = txt if isinstance(txt, str) else ""
                toks = _py_tokens(txt)
                low = [t.lower() for t in toks]
                n_chars = len(txt)
                n_tokens = len(toks)
                n_punct = sum(c in _PUNCT for c in txt)
                n_alpha = sum(
                    ("a" <= c <= "z") or ("A" <= c <= "Z") for c in txt
                )
                n_stop = sum(t in stop_set for t in low)
                n_nonws = sum(
                    c not in " \t\n\x0b\f\r" for c in txt
                )
                hits = {
                    lg: sum(t in marker_sets[lg] for t in low)
                    for lg in LANG_MARKERS
                }
                # argmax, name-ascending scan, strictly-greater replaces
                pred, best = langs_sorted[0], hits[langs_sorted[0]]
                for lg in langs_sorted[1:]:
                    if hits[lg] > best:
                        pred, best = lg, hits[lg]
                fp = 0
                for t in toks:
                    fp = (fp * FP_MUL + tok_hash(t)) % FP_MOD
                cols["n_chars"].append(n_chars)
                cols["n_tokens"].append(n_tokens)
                cols["punct_ratio"].append(
                    _round6(n_punct / n_chars) if n_chars else 0.0
                )
                cols["alpha_ratio"].append(
                    _round6(n_alpha / n_chars) if n_chars else 0.0
                )
                cols["stopword_ratio"].append(
                    _round6(n_stop / n_tokens) if n_tokens else 0.0
                )
                cols["avg_token_len"].append(
                    _round6(n_nonws / n_tokens) if n_tokens else 0.0
                )
                for lg in LANG_MARKERS:
                    cols[f"hits_{lg}"].append(hits[lg])
                cols["lang_pred"].append(pred)
                cols["fingerprint"].append(fp)
            out = pdf.copy()
            for k, v in cols.items():
                out[k] = v
            yield out

    return df.mapInPandas(stats, schema=out_schema)


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style within-document repetition metrics — the standard
    quality filters for web-scraped training text (boilerplate pages
    repeat the same line/navigation bigram over and over):

    - dup_line_frac: 1 - distinct_lines / lines
    - dup_line_char_frac: chars inside lines occurring >1 time / chars
      in all lines (both counting repeats)
    - top_bigram_frac: occurrences of the most frequent word bigram /
      total bigrams

    One Arrow-batched kernel, O(doc) python per doc (Counter over lines
    and bigrams — the same bounded per-doc pattern as the gram
    builders); all three ratios are exact-integer divisions, so the SQL
    twin reproduces them bit-for-bit unrounded."""
    from collections import Counter
    from typing import Iterator

    import numpy as np
    import pandas as pd

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            dl = np.zeros(n)
            dlc = np.zeros(n)
            tb = np.zeros(n)
            for k, txt in enumerate(pdf[text_col]):
                txt = txt if isinstance(txt, str) else ""
                lines = txt.split("\n")
                lc = Counter(lines)
                dl[k] = 1.0 - len(lc) / len(lines)
                chars_all = sum(len(ln) * c for ln, c in lc.items())
                if chars_all:
                    dlc[k] = sum(
                        len(ln) * c for ln, c in lc.items() if c > 1
                    ) / chars_all
                toks = txt.split()
                if len(toks) >= 2:
                    bc = Counter(zip(toks, toks[1:]))
                    tb[k] = max(bc.values()) / (len(toks) - 1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "dup_line_frac": dl,
                    "dup_line_char_frac": dlc,
                    "top_bigram_frac": tb,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        stats,
        schema=(f"{id_col} bigint, dup_line_frac double, "
                "dup_line_char_frac double, top_bigram_frac double"),
    )


# ---------------------------------------------------------------------------
# SQL twins (DuckDB dialect) — kept adjacent so drift is visible in review
# ---------------------------------------------------------------------------

def sql_token_count(text: str = "text") -> str:
    return (
        f"CASE WHEN LENGTH(TRIM({text})) = 0 THEN 0 "
        f"ELSE LEN(REGEXP_SPLIT_TO_ARRAY(TRIM({text}), '\\s+')) END"
    )


def sql_fingerprint(text: str = "text") -> str:
    tok_hash = "CAST(CONCAT('0x', SUBSTR(SHA256(w), 1, 15)) AS UBIGINT)"
    return f"""
    CASE WHEN LENGTH(TRIM({text})) = 0 THEN 0 ELSE
      LIST_REDUCE(
        LIST_PREPEND(CAST(0 AS BIGINT),
          LIST_TRANSFORM(REGEXP_SPLIT_TO_ARRAY(TRIM({text}), '\\s+'),
                         w -> CAST({tok_hash} AS BIGINT))),
        (acc, h) -> ((acc * {FP_MUL} + h) % {FP_MOD} + {FP_MOD}) % {FP_MOD})
    END"""


# ---------------------------------------------------------------------------
# PII scrubbing (Dolma / CCNet-style) — patterns restricted to the
# java.util.regex ∩ RE2 common subset (no backrefs, no lookaround, ASCII
# classes) so Spark and the DuckDB twin rewrite byte-identically
# ---------------------------------------------------------------------------

PII_PATTERNS: list[tuple[str, str, str]] = [
    # order matters: each pattern runs on the output of the previous one
    # (the alpha-TLD requirement keeps emails from eating IPs; the
    # replacement tokens contain no digits, so later patterns cannot
    # match inside earlier rewrites)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
]


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Replace emails / IPv4s / phone-shaped digit runs with typed
    tokens and count each category — the standard pre-training scrub
    (Dolma's pii filter, CCNet pipelines).  Pure JVM: chained
    regexp_replace plus a split-based match count per category (no
    Python, no HOF lambdas).  Counts are taken on the text as each
    pattern sees it (post-previous-rewrites), identical to the DuckDB
    twin `sql_scrub_pii` which replays the same patterns in the same
    order.  Word-boundary note: \\b is ASCII in RE2 and Unicode-aware
    in Java — identical on corpora where digits neighbor only ASCII
    word characters; the multibyte pytest pins the supported shapes."""
    cur = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for name, pat, tok in PII_PATTERNS:
        counts.append(
            (F.size(F.split(cur, pat, -1)) - 1).alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, tok)
    return df.select(
        F.col(id_col), cur.alias(text_col), *counts
    )


def sql_scrub_pii(text: str = "text") -> str:
    """DuckDB twin of scrub_pii: same patterns, same order, counts via
    regexp_extract_all on the same intermediate rewrites."""
    cur = f"COALESCE({text}, '')"
    count_cols = []
    for name, pat, tok in PII_PATTERNS:
        p = pat.replace("'", "''")
        count_cols.append(
            f"LEN(REGEXP_EXTRACT_ALL({cur}, '{p}')) AS n_{name}"
        )
        cur = f"REGEXP_REPLACE({cur}, '{p}', '{tok}', 'g')"
    return (
        f"SELECT doc_id, {cur} AS {text}, "
        + ", ".join(count_cols)
        + " FROM documents"
    )
