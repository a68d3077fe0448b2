"""BM25 top-k retrieval (Robertson/Sparck Jones probabilistic
weighting, the Okapi BM25 form) over the documents table — the
retrieval companion to tfidf_topk (per-doc keywords) and ann_*
(dense-vector search): given a small query set, score every document
containing at least one query term and return each query's top-k.

Integer quantization (the cross-engine exactness scheme this repo pins
— no ln, no float multiply anywhere):

    N       = corpus doc count,  T = total token count,  dl = doc len
    reldl   = (1000 * dl * N) div T            -- dl in 1/1000 of avgdl
    idf_q   = (10000 * (2N - 2df + 1)) div (2df + 1)
              -- the Robertson (N - df + 0.5)/(df + 0.5) odds ratio,
              -- made rational by doubling, scaled 1e4; the standard ln
              -- is dropped (it is monotone, so per-term ORDERING is
              -- preserved; cross-term sums weigh rare terms harder
              -- than ln-BM25 would — a documented, deterministic
              -- variant, not an approximation error)
    denom   = 10000*tf + 3000 + 9*reldl
              -- = 1e4 * (tf + k1*(1 - b + b*dl/avgdl)), k1=1.2 b=0.75
    tfc_q   = (220000000 * tf) div denom       -- 1e4 * k1+1 saturation,
                                               -- bounded <= 22000
    score_q = sum over matched terms of idf_q * tfc_q

Every step is integer div on exact integers, so Spark and DuckDB agree
bit-for-bit.  Overflow bound: score_q < n_query_terms * 4.4e8 * N —
int64-safe to ~1e9 docs for 10-term queries (the DuckDB twin sums in
HUGEINT and casts the final value, erroring rather than wrapping if a
deployment exceeds it).

Scale shapes (100 TB):
- queries are SMALL BY CONTRACT and broadcast; the corpus-side
  occurrence stream is first semi-joined to the query vocabulary, so
  tf/df aggregation runs over matched occurrences only.
- tf groups on (doc, term) — bounded by the doc; df groups on term —
  hash-agg partial combine absorbs hot terms map-side.
- corpus scalars (N, T) travel as a broadcast one-row cross join.
- top-k per query is TWO-LEVEL: a salted window (query, doc_id % salt
  buckets) keeps k per salt, then the final window ranks <= k *
  salt_buckets rows per query.  The (score DESC, doc_id ASC) order is
  total, so two-level selection returns exactly the global top-k —
  the oracle therefore verifies with a single ROW_NUMBER.

Reference analog: none (the reference has no text surface); this is
the engine's sparse-retrieval layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bm25_topk", "sql_bm25_topk"]


def _occurrences(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.when(
        F.length(t) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(t, r"\s+"))
    return df.select(F.col(id_col), F.explode(toks).alias("token"))


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    salt_buckets: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
) -> DataFrame:
    """(query_id, doc_id, score_q, rank) — each query's top-k docs by
    quantized BM25 (set-of-words queries; ties broken by doc_id ASC).
    Docs sharing no term with a query never appear."""
    occ = _occurrences(docs, text_col, id_col)
    qterms = (
        _occurrences(queries, qtext_col, qid_col)
        .withColumnRenamed(qid_col, "query_id")
        .distinct()
    )
    # corpus-side stats restricted to the query vocabulary (broadcast)
    vocab = F.broadcast(qterms.select("token").distinct())
    mocc = occ.join(vocab, "token", "leftsemi")
    tf = mocc.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df_docs")
    )
    dl = occ.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("dl")
    )
    scalars = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("dl").cast("bigint").alias("_t"),
    )
    scored = (
        tf.join(dfreq, "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(scalars))
        .withColumn("_reldl", F.expr("(1000 * dl * _n) div _t"))
        .withColumn(
            "_idf_q",
            F.expr("(10000 * (2 * _n - 2 * df_docs + 1)) div"
                   " (2 * df_docs + 1)"),
        )
        .withColumn(
            "_tfc_q",
            F.expr("(220000000 * tf) div"
                   " (10000 * tf + 3000 + 9 * _reldl)"),
        )
        .withColumn("_term_q", F.expr("_idf_q * _tfc_q"))
    )
    per_pair = (
        F.broadcast(qterms)
        .join(scored, "token")
        .groupBy("query_id", id_col)
        .agg(F.sum("_term_q").cast("bigint").alias("score_q"))
    )
    order = [F.col("score_q").desc(), F.col(id_col).asc()]
    salted = Window.partitionBy(
        "query_id", F.col(id_col) % salt_buckets
    ).orderBy(*order)
    final = Window.partitionBy("query_id").orderBy(*order)
    return (
        per_pair.withColumn("_srn", F.row_number().over(salted))
        .where(F.col("_srn") <= k)
        .withColumn("rank", F.row_number().over(final).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "score_q", "rank")
    )


def sql_bm25_topk(
    k: int = 5,
    table: str = "documents",
    queries_sql: str = "SELECT doc_id AS query_id, text AS qtext"
                       " FROM documents WHERE doc_id % 97 = 0",
) -> str:
    """DuckDB twin (single ROW_NUMBER — provably equal to the engine's
    two-level salted selection because the order is total)."""
    return f"""
WITH occ AS (
  SELECT doc_id,
         UNNEST(CASE WHEN LENGTH(TRIM(COALESCE(text, ''))) = 0
                     THEN CAST([] AS VARCHAR[])
                     ELSE REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')
                END) AS token
  FROM {table}
), q AS (
  SELECT DISTINCT query_id, UNNEST(
           CASE WHEN LENGTH(TRIM(COALESCE(qtext, ''))) = 0
                THEN CAST([] AS VARCHAR[])
                ELSE REGEXP_SPLIT_TO_ARRAY(TRIM(qtext), '\\s+') END
         ) AS token
  FROM ({queries_sql})
), mocc AS (
  SELECT occ.* FROM occ SEMI JOIN q ON occ.token = q.token
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM mocc GROUP BY doc_id, token
), dfreq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df_docs
  FROM tf GROUP BY token
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM occ GROUP BY doc_id
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS t
  FROM dl
), scored AS (
  SELECT tf.doc_id, tf.token,
         ((10000 * (2 * s.n - 2 * dfreq.df_docs + 1))
            // (2 * dfreq.df_docs + 1))
         * ((220000000 * tf.tf)
            // (10000 * tf.tf + 3000
                + 9 * ((1000 * dl.dl * s.n) // s.t))) AS term_q
  FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id) CROSS JOIN s
), pair AS (
  SELECT q.query_id, scored.doc_id,
         CAST(SUM(term_q) AS BIGINT) AS score_q
  FROM q JOIN scored USING (token)
  GROUP BY q.query_id, scored.doc_id
)
SELECT query_id, doc_id, score_q, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score_q DESC, doc_id ASC) AS rank
  FROM pair)
WHERE rank <= {k}
"""
