"""Corpus-relative term relevance: per-document tf-idf top-k terms
and a token-commonness quality proxy (the CCNet-style LM-filter
stand-in) — both pure-JVM, both integer-quantized so a SQL oracle
reproduces them bit-exactly.

Scale shapes (100 TB):
- token frequencies come from `groupBy(token)` over the exploded
  corpus: hash aggregation does PARTIAL map-side combine, so the hot
  tokens ("the", "a") collapse to one row per input partition before
  the shuffle — the same rule every dedup funnel here follows.
- joining occurrences back to the frequency table is a plain
  equi-join on the token; a hot token is a SKEWED JOIN key, which AQE
  splits at runtime (unlike a window partition, which it never can).
- the only window (tf-idf's per-doc top-k rank) partitions by doc_id,
  whose group size is bounded by the document's distinct-token count
  — bounded by doc length, not by corpus size.
- corpus scalars (doc count, total token count) travel as a
  broadcast one-row cross join, never a driver-side collect embedded
  in the plan.

Determinism (the oracle rules this repo pins everywhere): scores are
INTEGER-quantized — idf_q = (1e6 * n_docs) div df, score_q = tf *
idf_q, commonness_ppm = (1e6 * freq) div total_tokens — so there is
no float log/multiply to diverge between engines; the single final
IEEE division in commonness_score is bit-identical everywhere.

Reference analog: none (the reference has no text surface); this is
the engine's training-data quality/relevance layer, alongside
textstats and vocab_topk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["tfidf_topk", "commonness_score", "sql_tfidf_topk",
           "sql_commonness_score"]

_PPM = 1_000_000


def _token_rows(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token) per token OCCURRENCE — blank/NULL docs emit none."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.when(
        F.length(t) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(t, r"\s+"))
    return df.select(F.col(id_col), F.explode(toks).alias("token"))


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k terms by integer-quantized tf-idf:
    score_q = tf * ((1e6 * n_docs) div df_docs), ties broken by token
    ASC.  Returns (id, token, tf, df_docs, score_q, rank) — the
    keyword/topic signal a corpus-curation or retrieval pass reads.

    Docs with no tokens produce no rows (they have no terms)."""
    occ = _token_rows(df, text_col, id_col)
    tf = occ.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df_docs")
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("bigint").alias("_n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_q",
            F.expr(f"tf * (({_PPM} * _n_docs) div df_docs)").cast("bigint"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_q").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select(id_col, "token", "tf", "df_docs", "score_q", "rank")
    )


def commonness_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean token commonness — the cheap stand-in for a
    unigram-LM perplexity filter (CCNet buckets pages by LM score;
    rare-token-soup pages score low here, fluent prose over frequent
    vocabulary scores high).  Each token occurrence contributes its
    corpus frequency in ppm (integer-quantized:
    (1e6 * freq) div total_tokens); a document's score is the mean
    over its occurrences (the single IEEE division).

    Returns (id, n_tokens, sum_commonness_ppm, commonness) with
    commonness NULL for token-less docs."""
    occ = _token_rows(df, text_col, id_col)
    freq = occ.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq")
    )
    total = freq.agg(F.sum("freq").cast("bigint").alias("_total"))
    per_doc = (
        occ.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "_ppm", F.expr(f"({_PPM} * freq) div _total").cast("bigint")
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("_ppm").cast("bigint").alias("sum_commonness_ppm"),
        )
    )
    # left join back so token-less docs appear with NULL score
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint")
            .alias("n_tokens"),
            F.coalesce(F.col("sum_commonness_ppm"), F.lit(0)).cast("bigint")
            .alias("sum_commonness_ppm"),
            F.when(
                F.col("n_tokens") > 0,
                F.col("sum_commonness_ppm").cast("double")
                / F.col("n_tokens").cast("double"),
            ).alias("commonness"),
        )
    )


def _sql_token_occurrences(text: str, table: str, id_col: str) -> str:
    t = f"TRIM(COALESCE({text}, ''))"
    return f"""
  SELECT {id_col},
         UNNEST(CASE WHEN LENGTH({t}) = 0 THEN CAST([] AS VARCHAR[])
                     ELSE REGEXP_SPLIT_TO_ARRAY({t}, '\\s+') END) AS token
  FROM {table}
"""


def sql_tfidf_topk(k: int = 5, text: str = "text",
                   table: str = "documents",
                   id_col: str = "doc_id") -> str:
    """DuckDB twin of tfidf_topk (same tokenizer, quantization, ties)."""
    return f"""
WITH occ AS ({_sql_token_occurrences(text, table, id_col)}),
tf AS (
  SELECT {id_col}, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM occ GROUP BY {id_col}, token
),
dfreq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df_docs
  FROM tf GROUP BY token
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM {table}),
scored AS (
  SELECT tf.{id_col}, tf.token, tf.tf, dfreq.df_docs,
         CAST(tf.tf * (({_PPM} * n.n_docs) // dfreq.df_docs) AS BIGINT)
           AS score_q
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
)
SELECT {id_col}, token, tf, df_docs, score_q,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {id_col} ORDER BY score_q DESC, token ASC) AS rank
  FROM scored)
WHERE rank <= {k}
"""


def sql_commonness_score(text: str = "text", table: str = "documents",
                         id_col: str = "doc_id") -> str:
    """DuckDB twin of commonness_score."""
    return f"""
WITH occ AS ({_sql_token_occurrences(text, table, id_col)}),
freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
  FROM occ GROUP BY token
),
tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total FROM freq),
per_doc AS (
  SELECT occ.{id_col},
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(({_PPM} * freq.freq) // tot.total) AS BIGINT)
           AS sum_commonness_ppm
  FROM occ JOIN freq USING (token) CROSS JOIN tot
  GROUP BY occ.{id_col}
)
SELECT d.{id_col},
       CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.sum_commonness_ppm, 0) AS BIGINT)
         AS sum_commonness_ppm,
       CASE WHEN COALESCE(p.n_tokens, 0) > 0
            THEN CAST(p.sum_commonness_ppm AS DOUBLE)
                 / CAST(p.n_tokens AS DOUBLE)
            END AS commonness
FROM {table} d LEFT JOIN per_doc p USING ({id_col})
"""
