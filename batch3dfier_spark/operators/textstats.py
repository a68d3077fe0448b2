"""Text analysis for the training-data pipeline: language-ID, quality
scoring, token counting, document fingerprinting.

All hot-path computation is pure JVM Column expressions (regexp, array
higher-order functions) — no Python UDFs.  Every function has an exact
ANSI-SQL twin (DuckDB) used by the driver oracle; integer arithmetic is
kept inside int64 (Spark 4 runs ANSI mode: overflow would raise, so the
rolling fingerprint is reduced mod 2^31 at every step).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "quality_scores",
    "lang_scores",
    "fingerprint",
    "add_textstats",
    "repetition_stats",
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


def _tokens(text: Column) -> Column:
    # empty-safe whitespace tokenization; identical semantics to
    # regexp_split_to_array in the oracle after the same trim+guard
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for blank text)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(_tokens(text))
    )


def quality_scores(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / word-shape ratios (rounded so
    oracle value-hash comparison is float-noise-proof)."""
    n_chars = F.length(text)
    toks = _tokens(text)
    n_tokens = token_count(text)
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    stop_arr = F.array([F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    safe = lambda num, den: F.round(
        F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0)), 6
    )
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "punct_ratio": safe(n_punct, n_chars),
        "alpha_ratio": safe(n_alpha, n_chars),
        "stopword_ratio": safe(n_stop, n_tokens),
        # total non-whitespace chars / token count
        "avg_token_len": safe(
            F.length(F.regexp_replace(text, r"\s", "")), n_tokens
        ),
    }


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-word hit counts per language + arg-max prediction
    (deterministic tie-break: language name ascending)."""
    toks = F.transform(_tokens(text), lambda t: F.lower(t))
    counts = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array([F.lit(w) for w in markers])
        counts[f"hits_{lang}"] = F.size(
            F.filter(toks, lambda t: F.array_contains(arr, t))
        ).cast("bigint")
    # argmax with name-ascending tie-break, expression-only
    pred = None
    best = None
    for lang in sorted(LANG_MARKERS):
        c = counts[f"hits_{lang}"]
        if pred is None:
            pred, best = F.lit(lang), c
        else:
            cond = c > best
            pred = F.when(cond, F.lit(lang)).otherwise(pred)
            best = F.when(cond, c).otherwise(best)
    counts["lang_pred"] = pred
    return counts


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling document fingerprint:
    fold over tokens of (acc * 31 + tokhash) mod 2^31, with
    tokhash = int(first 15 hex chars of sha256(token)).
    Pure int64 arithmetic -> exact in any engine."""
    toks = _tokens(text)
    tok_hash = lambda w: F.conv(F.substring(F.sha2(w, 256), 1, 15), 16, 10).cast("bigint")
    fp = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, w: F.pmod(acc * F.lit(FP_MUL) + tok_hash(w), F.lit(FP_MOD)),
    )
    return F.when(F.length(F.trim(text)) == 0, F.lit(0).cast("bigint")).otherwise(fp)


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


def add_textstats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full textstats column family."""
    t = F.col(text_col)
    cols = {**quality_scores(t), **lang_scores(t), "fingerprint": fingerprint(t)}
    return df.withColumns(cols)


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
