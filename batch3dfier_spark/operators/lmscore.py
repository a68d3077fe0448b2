"""N-gram language-model quality scoring — the CCNet/Wikipedia-LM
perplexity filter (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data"), re-expressed as an exact
integer-bits unigram LM so Spark and the DuckDB oracle agree
bit-for-bit.

CCNet trains a KenLM on a trusted reference corpus and keeps web
pages whose perplexity under that model is low (head/middle buckets).
The distributed inference pass is: per-token negative log-probability
under a smoothed count model, summed per document, normalized by
document length.  This module implements that pass with an add-one-
smoothed unigram model and an EXACT integer log2:

    bits(x)   = LENGTH(BIN(x))          -- floor(log2 x) + 1, x >= 1
    cost(t)   = bits((N + V) div (cnt(t) + 1))
    lm_bits   = sum over token positions of cost(t)
    lm_mbits_tok = (1000 * lm_bits) div n_tokens

where N = total training tokens, V = vocabulary size, cnt(t) = the
token's training count (0 for out-of-vocabulary tokens, so unseen
tokens pay the maximum bits((N+V))).  `BIN` renders a positive BIGINT
without padding in both engines, so `LENGTH(BIN(x))` is the same
integer everywhere — no float log, no IEEE ordering concern.  The
bits quantization is monotone in the true -log2 p, so thresholding
lm_mbits_tok is a genuine (coarsened) perplexity filter; CCNet's
bucket cutoffs are percentiles, which survive any monotone transform.

Scale shape (100 TB):
1. train: explode -> groupBy(token) with map-side partial aggregation
   (hot tokens like "the" combine inside each task before the
   shuffle); one extra 1-row total.
2. score: explode -> groupBy(doc_id, token) counts — the key INCLUDES
   doc_id, so a stopword shared by 1e9 docs is 1e9 different keys,
   never one hot group — then an equi-join on token against the
   vocabulary.  The probe side IS skewed on hot tokens; that is a
   JOIN, which AQE's skew-split can partition at runtime (the
   house rule: hot values may meet joins and aggregates, never
   windows).  Pass broadcast_vocab=True when the trained vocabulary
   is known to fit (CCNet-sized reference vocabularies do) and the
   shuffle disappears entirely.
3. per-doc sum: groupBy(doc_id) — uniform keys; then a left join back
   onto the input so token-less documents score bias-only rows.

Reference analog: none (the reference has no text surface); this
completes the quality layer next to quality_score's linear head —
CCNet runs exactly these two models back to back.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "lm_train", "lm_score", "sql_lm_score", "DEFAULT_LM_THRESHOLD",
    "lm2_train", "lm2_score", "sql_lm2_score", "DEFAULT_LM2_THRESHOLD",
]

# keeps the low-bits (natural-prose) band of the synthetic corpus:
# chosen at the fixture tertile (sf0.001 lm_mbits_tok p33 = 5016,
# ~5.0 bits/token under the self-trained model) so the default is a
# real classifier on the test tables, mirroring quality_score;
# production callers pin their own operating point from a held-out
# percentile sweep (CCNet's head/middle/tail buckets).
DEFAULT_LM_THRESHOLD = 5_016


def _idiv(num: Column, den: Column) -> Column:
    # exact integer division: num - num % den is exactly divisible,
    # the integer quotient < 2^53 is IEEE-exact, equals DuckDB's `//`
    return F.when(den > 0, ((num - num % den) / den).cast("long")
                  ).otherwise(F.lit(0).cast("long"))


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, tok) — lowercased whitespace tokens, one row per token
    POSITION (duplicates preserved); empty docs contribute no rows."""
    toks = F.split(
        F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    return (
        df.select(F.col(id_col), F.explode(toks).alias("tok"))
        .where(F.length("tok") > 0)
    )


def lm_train(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Unigram model: (tok, cnt) token counts over the reference
    corpus.  One explode + one partial-aggregated groupBy."""
    toks = F.split(
        F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    return (
        df.select(F.explode(toks).alias("tok"))
        .where(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def lm_score(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_mbits: int = DEFAULT_LM_THRESHOLD,
    broadcast_vocab: bool = False,
) -> DataFrame:
    """Attach per-document LM cost columns to `df`:

    lm_bits       total integer bits under the add-one unigram model
    lm_mbits_tok  milli-bits per token (0 for token-less docs)
    lm_kept       lm_mbits_tok <= threshold AND the doc has tokens

    `vocab` is lm_train's output (tok, cnt).  All arithmetic is exact
    BIGINT; see module docstring for the cost law and the scale shape.
    """
    totals = vocab.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("_n_total"),
        F.count(F.lit(1)).cast("long").alias("_v_size"),
    )
    vjoin = F.broadcast(vocab) if broadcast_vocab else vocab
    doc_tok = (
        _tokens(df.select(id_col, text_col), text_col, id_col)
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    smoothed = F.col("_n_total") + F.col("_v_size")
    cost = F.length(
        F.bin(_idiv(smoothed, F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1)))
    ).cast("long")
    scored = (
        doc_tok.join(vjoin, "tok", "left")
        .crossJoin(F.broadcast(totals))
        .select(id_col, "_c", cost.alias("_bits"))
        .groupBy(id_col)
        .agg(
            F.sum(F.col("_c") * F.col("_bits")).cast("long").alias("lm_bits"),
            F.sum("_c").cast("long").alias("_n_tok"),
        )
    )
    out = (
        df.join(scored, id_col, "left")
        .withColumn("lm_bits",
                    F.coalesce(F.col("lm_bits"), F.lit(0)).cast("long"))
        .withColumn(
            "lm_mbits_tok",
            _idiv(F.lit(1000) * F.col("lm_bits"),
                  F.coalesce(F.col("_n_tok"), F.lit(0))),
        )
        .withColumn(
            "lm_kept",
            (F.coalesce(F.col("_n_tok"), F.lit(0)) > 0)
            & (F.col("lm_mbits_tok") <= F.lit(threshold_mbits)),
        )
        .drop("_n_tok")
    )
    return out


def sql_lm_score(
    text: str = "text",
    id_col: str = "doc_id",
    threshold_mbits: int = DEFAULT_LM_THRESHOLD,
    corpus_sql: str = "SELECT doc_id, text FROM documents",
    train_sql: str | None = None,
    select_cols: str = "doc_id",
) -> str:
    """DuckDB twin: the identical token law, count model, BIN-length
    integer log2, and guarded integer divisions.  `train_sql` defaults
    to the scored corpus itself (self-trained model)."""
    train = train_sql or corpus_sql
    tok_expr = (
        f"UNNEST(REGEXP_SPLIT_TO_ARRAY("
        f"TRIM(LOWER(COALESCE({text}, ''))), '\\s+'))"
    )
    return f"""
WITH corpus AS ({corpus_sql}),
train_toks AS (
  SELECT tok FROM (
    SELECT {tok_expr} AS tok FROM ({train})
  ) WHERE LENGTH(tok) > 0
),
vocab AS (SELECT tok, COUNT(*)::BIGINT AS cnt FROM train_toks GROUP BY tok),
tot AS (
  SELECT COALESCE(SUM(cnt), 0)::BIGINT AS n_total,
         COUNT(*)::BIGINT AS v_size
  FROM vocab
),
doc_toks AS (
  SELECT {id_col}, tok FROM (
    SELECT {id_col}, {tok_expr} AS tok FROM corpus
  ) WHERE LENGTH(tok) > 0
),
dt AS (
  SELECT {id_col}, tok, COUNT(*)::BIGINT AS c
  FROM doc_toks GROUP BY {id_col}, tok
),
costed AS (
  SELECT dt.{id_col}, dt.c,
         LENGTH(BIN((tot.n_total + tot.v_size)
                    // (COALESCE(v.cnt, 0) + 1)))::BIGINT AS bits
  FROM dt LEFT JOIN vocab v USING (tok), tot
),
agg AS (
  SELECT {id_col}, SUM(c * bits)::BIGINT AS lm_bits,
         SUM(c)::BIGINT AS n_tok
  FROM costed GROUP BY {id_col}
)
SELECT {select_cols},
       COALESCE(a.lm_bits, 0)::BIGINT AS lm_bits,
       CASE WHEN COALESCE(a.n_tok, 0) > 0
            THEN (1000 * a.lm_bits) // a.n_tok
            ELSE 0 END::BIGINT AS lm_mbits_tok,
       (COALESCE(a.n_tok, 0) > 0
        AND (CASE WHEN COALESCE(a.n_tok, 0) > 0
                  THEN (1000 * a.lm_bits) // a.n_tok
                  ELSE 0 END) <= {threshold_mbits}) AS lm_kept
FROM corpus d LEFT JOIN agg a USING ({id_col})
"""


# ---------------------------------------------------------------------------
# Bigram LM — the conditional-probability upgrade of the unigram filter
# ---------------------------------------------------------------------------

def _bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, big) — one row per ADJACENT token pair, built map-only:
    arrays_zip over two shifted slices of the token array (plain
    built-ins; no HOF lambda reaches the plan).  A doc with < 2 tokens
    contributes no rows; the trimmed split can produce no interior
    empty tokens, so no post-filter is needed."""
    toks = F.split(
        F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    n = F.size(toks)
    z = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("w1"),
        F.slice(toks, 2, n - 1).alias("w2"),
    )
    return (
        df.select(F.col(id_col), F.explode(z).alias("p"))
        .where(F.length("p.w1") > 0)
        .select(
            id_col,
            F.col("p.w1").alias("w1"),
            F.concat_ws(" ", "p.w1", "p.w2").alias("big"),
        )
    )


def lm2_train(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram model: (big, cnt2) adjacent-pair counts over the
    reference corpus — one map-only zip/explode + one
    partial-aggregated groupBy (hot bigrams combine map-side).  Use
    WITH lm_train's unigram counts: the add-one conditional is
    P(w2|w1) = (cnt2 + 1) / (cnt1(w1) + V)."""
    return (
        _bigrams(df.select(F.lit(0).alias("_i"), text_col), text_col, "_i")
        .groupBy("big")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt2"))
    )


# fixture tertile of lm2_mbits_big at sf0.001 (self-trained model,
# p33 = 5320, ~5.3 bits/bigram), mirroring DEFAULT_LM_THRESHOLD's
# calibration for the unigram filter
DEFAULT_LM2_THRESHOLD = 5_320


def lm2_score(
    df: DataFrame,
    vocab: DataFrame,
    bigrams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_mbits: int = DEFAULT_LM2_THRESHOLD,
    broadcast_vocab: bool = False,
) -> DataFrame:
    """Attach per-document BIGRAM LM cost columns to `df`:

    lm2_bits       total integer bits under the add-one bigram model
    lm2_mbits_big  milli-bits per bigram position (0 if < 2 tokens)
    lm2_kept       lm2_mbits_big <= threshold AND the doc has a bigram

    cost(w1 w2) = bits((cnt1(w1) + V) div (cnt2(w1 w2) + 1)) with
    cnt1/V from `vocab` (lm_train) and cnt2 from `bigrams`
    (lm2_train); an unseen context pays bits(V).  Same exact-BIGINT
    discipline and scale shape as lm_score — the bigram probe is an
    equi-join AQE can skew-split; the per-doc key includes the doc id
    so no hot group forms."""
    v_size = vocab.agg(
        F.count(F.lit(1)).cast("long").alias("_v_size"))
    v1 = (F.broadcast(vocab) if broadcast_vocab else vocab) \
        .withColumnRenamed("tok", "w1").withColumnRenamed("cnt", "_cnt1")
    v2 = (F.broadcast(bigrams) if broadcast_vocab else bigrams) \
        .withColumnRenamed("cnt2", "_cnt2")
    doc_big = (
        _bigrams(df.select(id_col, text_col), text_col, id_col)
        .groupBy(id_col, "w1", "big")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    cost = F.length(F.bin(_idiv(
        F.coalesce(F.col("_cnt1"), F.lit(0)) + F.col("_v_size"),
        F.coalesce(F.col("_cnt2"), F.lit(0)) + F.lit(1),
    ))).cast("long")
    scored = (
        doc_big.join(v2, "big", "left")
        .join(v1, "w1", "left")
        .crossJoin(F.broadcast(v_size))
        .select(id_col, "_c", cost.alias("_bits"))
        .groupBy(id_col)
        .agg(
            F.sum(F.col("_c") * F.col("_bits")).cast("long")
            .alias("lm2_bits"),
            F.sum("_c").cast("long").alias("_n_big"),
        )
    )
    return (
        df.join(scored, id_col, "left")
        .withColumn("lm2_bits",
                    F.coalesce(F.col("lm2_bits"), F.lit(0)).cast("long"))
        .withColumn(
            "lm2_mbits_big",
            _idiv(F.lit(1000) * F.col("lm2_bits"),
                  F.coalesce(F.col("_n_big"), F.lit(0))),
        )
        .withColumn(
            "lm2_kept",
            (F.coalesce(F.col("_n_big"), F.lit(0)) > 0)
            & (F.col("lm2_mbits_big") <= F.lit(threshold_mbits)),
        )
        .drop("_n_big")
    )


def sql_lm2_score(
    text: str = "text",
    id_col: str = "doc_id",
    threshold_mbits: int = DEFAULT_LM2_THRESHOLD,
    corpus_sql: str = "SELECT doc_id, text FROM documents",
    train_sql: str | None = None,
    select_cols: str = "doc_id",
) -> str:
    """DuckDB twin of lm2_score: identical token/bigram law (list
    comprehension over the split array), count model, BIN-length
    integer log2 and guarded divisions."""
    train = train_sql or corpus_sql
    arr = f"REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE({text}, ''))), '\\s+')"
    big_list = (f"[{{'w1': a[i], 'big': a[i] || ' ' || a[i+1]}}"
                f" FOR i IN RANGE(1, LEN(a))]")
    tok_expr = f"UNNEST({arr})"
    return f"""
WITH corpus AS ({corpus_sql}),
train_toks AS (
  SELECT tok FROM (SELECT {tok_expr} AS tok FROM ({train}))
  WHERE LENGTH(tok) > 0
),
vocab AS (SELECT tok, COUNT(*)::BIGINT AS cnt FROM train_toks GROUP BY tok),
vs AS (SELECT COUNT(*)::BIGINT AS v_size FROM vocab),
train_bigs AS (
  SELECT UNNEST({big_list}, recursive := true)
  FROM (SELECT {arr} AS a FROM ({train}))
  WHERE LEN(a) >= 2 AND LENGTH(a[1]) > 0
),
big_vocab AS (
  SELECT big, COUNT(*)::BIGINT AS cnt2 FROM train_bigs GROUP BY big
),
doc_bigs AS (
  SELECT {id_col}, UNNEST({big_list}, recursive := true)
  FROM (SELECT {id_col}, {arr} AS a FROM corpus)
  WHERE LEN(a) >= 2 AND LENGTH(a[1]) > 0
),
db AS (
  SELECT {id_col}, w1, big, COUNT(*)::BIGINT AS c
  FROM doc_bigs GROUP BY {id_col}, w1, big
),
costed AS (
  SELECT db.{id_col}, db.c,
         LENGTH(BIN((COALESCE(v.cnt, 0) + vs.v_size)
                    // (COALESCE(b.cnt2, 0) + 1)))::BIGINT AS bits
  FROM db
  LEFT JOIN big_vocab b USING (big)
  LEFT JOIN vocab v ON v.tok = db.w1, vs
),
agg AS (
  SELECT {id_col}, SUM(c * bits)::BIGINT AS lm2_bits,
         SUM(c)::BIGINT AS n_big
  FROM costed GROUP BY {id_col}
)
SELECT {select_cols},
       COALESCE(a.lm2_bits, 0)::BIGINT AS lm2_bits,
       CASE WHEN COALESCE(a.n_big, 0) > 0
            THEN (1000 * a.lm2_bits) // a.n_big
            ELSE 0 END::BIGINT AS lm2_mbits_big,
       (COALESCE(a.n_big, 0) > 0
        AND (CASE WHEN COALESCE(a.n_big, 0) > 0
                  THEN (1000 * a.lm2_bits) // a.n_big
                  ELSE 0 END) <= {threshold_mbits}) AS lm2_kept
FROM corpus d LEFT JOIN agg a USING ({id_col})
"""
