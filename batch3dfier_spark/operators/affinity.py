"""Target-domain affinity scoring — the data-selection signal of
DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") re-expressed in this repo's exact-integer
oracle discipline: split the corpus into a TARGET slice (the domain
you want more of — a curated source, a language, a quality stratum)
and the RAW remainder, estimate both unigram distributions, and score
every document by how much more target-like than raw-like its tokens
are.

Quantization variant (documented, deterministic — same move as bm25's
ln-free idf): DSIR's per-token log-likelihood ratio
log p_tgt(t) - log p_raw(t) is replaced by the ppm DIFFERENCE

    affinity_q(t) = (1e6 * freq_tgt(t)) div total_tgt
                  - (1e6 * freq_raw(t)) div total_raw

so every per-token weight is an exact integer in [-1e6, 1e6], a doc's
sum is bounded by 1e6 * doc_len (never overflows), and Spark and
DuckDB agree bit-for-bit.  Linear-domain differences weight common
tokens harder than log-domain ratios would — a defined variant, not an
approximation error.  mean_affinity_q = sum div n_tokens (integer
div, NULL-free: token-less docs get sum 0 and keep NULL mean).

Selection: `kept = mean_affinity_q >= threshold_q` — the deterministic
top-slice stand-in for DSIR's importance resampling (resampling noise
would break the oracle; a fixed threshold is what a production curation
pass pins anyway).

Scale shapes (100 TB):
- unigram tables come from ONE groupBy(token) with conditional sums —
  hash-agg partial combine absorbs hot tokens map-side; no window.
- corpus totals travel as a broadcast one-row cross join.
- re-joining occurrences to token weights is an equi-join on the
  token: a hot token is a skewed JOIN key, which AQE splits at
  runtime.
- the per-doc rollup groups on doc_id — bounded by doc length.

Reference analog: none (the reference has no text surface); this sits
beside sample_* / domain_cap / hash_split in the sampling layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["target_affinity", "sql_target_affinity"]

_PPM = 1_000_000


def _occ(df: DataFrame, text_col: str, id_col: str,
         flag_col: str) -> DataFrame:
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.when(
        F.length(t) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(t, r"\s+"))
    return df.select(
        F.col(id_col), F.col(flag_col), F.explode(toks).alias("token")
    )


def target_affinity(
    df: DataFrame,
    is_target,
    threshold_q: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, sum_affinity_q, mean_affinity_q, kept) for every
    document.  `is_target` is a boolean Column marking the target
    slice; docs in EITHER slice are scored (the target docs' own
    scores tell you how separable the domains are).  Token-less docs
    score 0 with NULL mean and are never kept."""
    flagged = df.withColumn("_tgt", is_target.cast("boolean"))
    occ = _occ(flagged, text_col, id_col, "_tgt")
    freq = occ.groupBy("token").agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0))
        .cast("bigint").alias("f_tgt"),
        F.sum(F.when(F.col("_tgt"), 0).otherwise(1))
        .cast("bigint").alias("f_raw"),
    )
    totals = freq.agg(
        F.sum("f_tgt").cast("bigint").alias("_t_tgt"),
        F.sum("f_raw").cast("bigint").alias("_t_raw"),
    )
    weighted = (
        freq.crossJoin(F.broadcast(totals))
        .withColumn(
            "_aff",
            F.expr(f"({_PPM} * f_tgt) div _t_tgt"
                   f" - ({_PPM} * f_raw) div _t_raw"),
        )
        .select("token", "_aff")
    )
    per_doc = (
        occ.join(weighted, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("_aff").cast("bigint").alias("sum_affinity_q"),
        )
        .withColumn(
            "mean_affinity_q",
            F.expr("sum_affinity_q div n_tokens").cast("bigint"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint")
            .alias("n_tokens"),
            F.coalesce(F.col("sum_affinity_q"), F.lit(0)).cast("bigint")
            .alias("sum_affinity_q"),
            F.col("mean_affinity_q"),
            F.coalesce(
                F.col("mean_affinity_q") >= F.lit(threshold_q),
                F.lit(False),
            ).alias("kept"),
        )
    )


def sql_target_affinity(
    target_pred: str,
    threshold_q: int = 0,
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin; `target_pred` is the SQL boolean marking the
    target slice (e.g. "lang = 'en'")."""
    t = f"TRIM(COALESCE({text}, ''))"
    return f"""
WITH occ AS (
  SELECT {id_col}, ({target_pred}) AS tgt,
         UNNEST(CASE WHEN LENGTH({t}) = 0 THEN CAST([] AS VARCHAR[])
                     ELSE REGEXP_SPLIT_TO_ARRAY({t}, '\\s+') END) AS token
  FROM {table}
), freq AS (
  SELECT token,
         CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS f_tgt,
         CAST(SUM(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS f_raw
  FROM occ GROUP BY token
), tot AS (
  SELECT CAST(SUM(f_tgt) AS BIGINT) AS t_tgt,
         CAST(SUM(f_raw) AS BIGINT) AS t_raw
  FROM freq
), weighted AS (
  SELECT token,
         ({_PPM} * f_tgt) // t_tgt - ({_PPM} * f_raw) // t_raw AS aff
  FROM freq CROSS JOIN tot
), per_doc AS (
  SELECT occ.{id_col},
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(aff) AS BIGINT) AS sum_affinity_q
  FROM occ JOIN weighted USING (token)
  GROUP BY occ.{id_col}
)
SELECT d.{id_col},
       CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.sum_affinity_q, 0) AS BIGINT) AS sum_affinity_q,
       CAST(p.sum_affinity_q // p.n_tokens AS BIGINT) AS mean_affinity_q,
       COALESCE(p.sum_affinity_q // p.n_tokens >= {threshold_q}, FALSE)
         AS kept
FROM {table} d LEFT JOIN per_doc p USING ({id_col})
"""
