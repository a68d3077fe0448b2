"""Driver-contract queries: every operator from SURVEY.md §2, run by the
engine's own operators over /root/testdata tables, each with an exact
ANSI-SQL oracle twin for DuckDB.

Cross-engine determinism rules (verified in-session):
- hashing: sha2/sha256 produce identical lowercase hex; hex->int via
  Spark `conv(...,16,10)` == DuckDB `cast('0x'||... as ubigint)`.
- geocode: pure int64 LCG + IEEE double affine map, identical op order
  in both engines -> bit-identical x,y.
- float aggregates (sums/percentiles/cosines) are rounded on BOTH
  sides so accumulation-order noise cannot break value-hash compares.

The geocode here is the documents-table variant (doc_id-keyed LCG) —
SQL-expressible so DuckDB can recompute it; the pages-table variant
(sha256 of url|warc_ts) is functions/geocode.py and is exercised by the
pytest oracle suite instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen import REF_TERRITORY
from ..geo import Rect
from ..operators import tiler
from ..operators.heights import join_heights, percentile_heights
from ..operators.neighbors import knn_tiles, tile_neighbors_spark
from ..operators.tiler import TileIndex

# ---------------------------------------------------------------------------
# Shared constants (Spark and oracle SQL derive from the same values)
# ---------------------------------------------------------------------------

T = REF_TERRITORY
GRID_N = 8                      # 8x8 footprint grid
ASSET_N = 2                     # 2x2 asset grid
WX = (T.xmax - T.xmin) / GRID_N     # 78.125 (exact binary)
WY = (T.ymax - T.ymin) / GRID_N     # 97.65625 (exact binary)
LCG_X_MUL = 2654435761          # Knuth multiplicative hashes
LCG_Y_MUL = 2246822519
LCG_Y_ADD = 1013904223
TWO32 = 4294967296

# the P4/P3 query extent: a rectangle and a diamond (convex polygon whose
# membership has a closed form both engines can evaluate)
QRECT = Rect(120700.0, 486000.0, 121000.0, 486400.0)
DIAMOND_CX = (T.xmin + T.xmax) / 2.0
DIAMOND_CY = (T.ymin + T.ymax) / 2.0
DIAMOND_A = (T.xmax - T.xmin) / 3.0
DIAMOND_B = (T.ymax - T.ymin) / 3.0
DIAMOND_POLY = [
    (DIAMOND_CX + DIAMOND_A, DIAMOND_CY),
    (DIAMOND_CX, DIAMOND_CY + DIAMOND_B),
    (DIAMOND_CX - DIAMOND_A, DIAMOND_CY),
    (DIAMOND_CX, DIAMOND_CY - DIAMOND_B),
]


def doc_geocode(df: DataFrame) -> DataFrame:
    """Deterministic geocode of the documents table (doc_id LCG) — the
    SQL-expressible twin of the pages-table sha256 geocode."""
    xh = (F.col("doc_id") * F.lit(LCG_X_MUL)) % F.lit(TWO32)
    yh = (F.col("doc_id") * F.lit(LCG_Y_MUL) + F.lit(LCG_Y_ADD)) % F.lit(TWO32)
    x = F.lit(T.xmin) + xh.cast("double") / F.lit(float(TWO32)) * F.lit(T.xmax - T.xmin)
    y = F.lit(T.ymin) + yh.cast("double") / F.lit(float(TWO32)) * F.lit(T.ymax - T.ymin)
    return df.withColumn("x", x).withColumn("y", y)


# the same derivation as a SQL fragment (DuckDB; all-double arithmetic)
GEO_SQL = f"""
  SELECT doc_id, text, lang, source, n_chars,
         {T.xmin} + ((doc_id * {LCG_X_MUL}) % {TWO32}) / CAST({TWO32} AS DOUBLE) * {T.xmax - T.xmin} AS x,
         {T.ymin} + ((doc_id * {LCG_Y_MUL} + {LCG_Y_ADD}) % {TWO32}) / CAST({TWO32} AS DOUBLE) * {T.ymax - T.ymin} AS y
  FROM documents
"""

TILE_SQL = f"""
  SELECT *,
         (tile_row * {GRID_N} + tile_col + 1) AS tile_gid,
         't_' || CAST(tile_row AS VARCHAR) || '_' || CAST(tile_col AS VARCHAR) AS tile_unit
  FROM (
    SELECT *,
           LEAST(CAST(FLOOR((x - {T.xmin}) / {WX}) AS BIGINT), {GRID_N - 1}) AS tile_col,
           LEAST(CAST(FLOOR((y - {T.ymin}) / {WY}) AS BIGINT), {GRID_N - 1}) AS tile_row
    FROM ({GEO_SQL})
  )
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _grid_index() -> TileIndex:
    return TileIndex.regular_grid(T, GRID_N, GRID_N)


def _assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tiler.assign_tiles(doc_geocode(_docs(spark, sf_dir)), _grid_index())


# ---------------------------------------------------------------------------
# queries — each returns (spark_fn, oracle_sql | None)
# ---------------------------------------------------------------------------

def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: per-feature tile assignment (grid fast path, exactly-one)."""
    return _assigned(spark, sf_dir).select(
        "doc_id", "tile_col", "tile_row", "tile_gid", "tile_unit"
    )


SQL_TILE_ASSIGN = f"""
SELECT doc_id, tile_col, tile_row, tile_gid, tile_unit FROM ({TILE_SQL})
"""


BUFFER = 10.0  # clip-with-overlap buffer for the multi-assignment query


def q_tile_assign_buffered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 buffered multi-assignment (clip-with-overlap): every doc lands
    in EVERY tile whose buffer-expanded rect contains it — border docs
    appear in 2-4 tiles; buffer=0 restores the exactly-one rule.  The
    engine generates candidate col/row ranges JVM-side (sequence +
    explode); the oracle joins against the expanded grid directly."""
    return tiler.assign_tiles(
        doc_geocode(_docs(spark, sf_dir)), _grid_index(), buffer=BUFFER
    ).select("doc_id", "tile_gid", "tile_unit")


SQL_TILE_ASSIGN_BUFFERED = f"""
WITH grid AS (
  SELECT (r * {GRID_N} + c + 1) AS gid,
         't_' || CAST(r AS VARCHAR) || '_' || CAST(c AS VARCHAR) AS unit,
         {T.xmin} + c * {WX} AS xmin, {T.ymin} + r * {WY} AS ymin,
         {T.xmin} + (c + 1) * {WX} AS xmax, {T.ymin} + (r + 1) * {WY} AS ymax
  FROM (SELECT UNNEST(RANGE({GRID_N})) AS c), (SELECT UNNEST(RANGE({GRID_N})) AS r)
)
SELECT d.doc_id, CAST(g.gid AS BIGINT) AS tile_gid, g.unit AS tile_unit
FROM ({GEO_SQL}) d JOIN grid g
  ON d.x >= g.xmin - {BUFFER} AND d.x < g.xmax + {BUFFER}
 AND d.y >= g.ymin - {BUFFER} AND d.y < g.ymax + {BUFFER}
"""


def q_tile_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-tile output row counts (the per-tile view cardinality)."""
    return (
        _assigned(spark, sf_dir)
        .groupBy("tile_gid", "tile_unit")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


SQL_TILE_COUNTS = f"""
SELECT tile_gid, tile_unit, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM ({TILE_SQL}) GROUP BY tile_gid, tile_unit
"""


def q_tile_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: tiles of the 8x8 index intersecting the query rect (driver-
    side STRtree + exact test, emitted as a DataFrame)."""
    sel = tiler.select_tiles(
        _grid_index(),
        [
            (QRECT.xmin, QRECT.ymin), (QRECT.xmax, QRECT.ymin),
            (QRECT.xmax, QRECT.ymax), (QRECT.xmin, QRECT.ymax),
        ],
    )
    return spark.createDataFrame(sel[["gid", "unit"]]).select(
        F.col("gid").cast("bigint").alias("gid"), "unit"
    )


SQL_TILE_SELECT = f"""
WITH grid AS (
  SELECT (r * {GRID_N} + c + 1) AS gid,
         't_' || CAST(r AS VARCHAR) || '_' || CAST(c AS VARCHAR) AS unit,
         {T.xmin} + c * {WX} AS xmin, {T.ymin} + r * {WY} AS ymin,
         {T.xmin} + (c + 1) * {WX} AS xmax, {T.ymin} + (r + 1) * {WY} AS ymax
  FROM (SELECT UNNEST(RANGE({GRID_N})) AS c), (SELECT UNNEST(RANGE({GRID_N})) AS r)
)
SELECT CAST(gid AS BIGINT) AS gid, unit FROM grid
WHERE xmin <= {QRECT.xmax} AND {QRECT.xmin} <= xmax
  AND ymin <= {QRECT.ymax} AND {QRECT.ymin} <= ymax
"""


def q_extent_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: select-not-clip extent filter (diamond polygon) -> per-tile
    counts of contained features.  The engine runs the general even-odd
    polygon kernel; the oracle recomputes via the diamond's closed form."""
    df = tiler.extent_filter(_assigned(spark, sf_dir), DIAMOND_POLY)
    return df.groupBy("tile_gid", "tile_unit").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


SQL_EXTENT_FILTER = f"""
SELECT tile_gid, tile_unit, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM ({TILE_SQL})
WHERE ABS(x - {DIAMOND_CX}) / {DIAMOND_A} + ABS(y - {DIAMOND_CY}) / {DIAMOND_B} < 1.0
GROUP BY tile_gid, tile_unit
"""


def q_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: interval-overlap join footprint grid x asset grid (closed
    bounds, st_intersects semantics) as a broadcast range join."""
    a = _grid_index().spark_df(spark)
    b = TileIndex.regular_grid(T, ASSET_N, ASSET_N).spark_df(spark)
    return tile_neighbors_spark(a, b).select(
        F.col("ftpr_gid").cast("bigint").alias("ftpr_gid"),
        F.col("asset_gid").cast("bigint").alias("asset_gid"),
    )


_AW = (T.xmax - T.xmin) / ASSET_N
_AH = (T.ymax - T.ymin) / ASSET_N
SQL_NEIGHBOR_PAIRS = f"""
WITH fgrid AS (
  SELECT (r * {GRID_N} + c + 1) AS gid,
         {T.xmin} + c * {WX} AS xmin, {T.ymin} + r * {WY} AS ymin,
         {T.xmin} + (c + 1) * {WX} AS xmax, {T.ymin} + (r + 1) * {WY} AS ymax
  FROM (SELECT UNNEST(RANGE({GRID_N})) AS c), (SELECT UNNEST(RANGE({GRID_N})) AS r)
), agrid AS (
  SELECT (r * {ASSET_N} + c + 1) AS gid,
         {T.xmin} + c * {_AW} AS xmin, {T.ymin} + r * {_AH} AS ymin,
         {T.xmin} + (c + 1) * {_AW} AS xmax, {T.ymin} + (r + 1) * {_AH} AS ymax
  FROM (SELECT UNNEST(RANGE({ASSET_N})) AS c), (SELECT UNNEST(RANGE({ASSET_N})) AS r)
)
SELECT CAST(f.gid AS BIGINT) AS ftpr_gid, CAST(a.gid AS BIGINT) AS asset_gid
FROM fgrid f, agrid a
WHERE f.xmin <= a.xmax AND a.xmin <= f.xmax
  AND f.ymin <= a.ymax AND a.ymin <= f.ymax
"""


def q_knn_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-partitioned kNN: 3 nearest tiles (point-to-rect distance,
    gid tie-break) for a deterministic sample of features."""
    df = doc_geocode(_docs(spark, sf_dir)).where(F.col("doc_id") % 50 == 0)
    out = knn_tiles(df, _grid_index(), k=3, keep=("doc_id",))
    return out.select(
        "doc_id",
        F.col("nn_rank").cast("int").alias("nn_rank"),
        "nn_gid",
        "nn_unit",
        F.round("nn_dist", 4).alias("nn_dist"),
    )


SQL_KNN_TILES = f"""
WITH grid AS (
  SELECT (r * {GRID_N} + c + 1) AS gid,
         't_' || CAST(r AS VARCHAR) || '_' || CAST(c AS VARCHAR) AS unit,
         {T.xmin} + c * {WX} AS xmin, {T.ymin} + r * {WY} AS ymin,
         {T.xmin} + (c + 1) * {WX} AS xmax, {T.ymin} + (r + 1) * {WY} AS ymax
  FROM (SELECT UNNEST(RANGE({GRID_N})) AS c), (SELECT UNNEST(RANGE({GRID_N})) AS r)
), pts AS (
  SELECT doc_id, x, y FROM ({GEO_SQL}) WHERE doc_id % 50 = 0
), dxy AS (
  SELECT p.doc_id, g.gid, g.unit,
         GREATEST(g.xmin - p.x, p.x - g.xmax, 0) AS dx,
         GREATEST(g.ymin - p.y, p.y - g.ymax, 0) AS dy
  FROM pts p, grid g
), dists AS (
  SELECT doc_id, gid, unit, SQRT(dx * dx + dy * dy) AS dist FROM dxy
), ranked AS (
  SELECT doc_id, gid, unit, dist,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist, gid) AS rk
  FROM dists
)
SELECT doc_id, CAST(rk AS INT) AS nn_rank, CAST(gid AS BIGINT) AS nn_gid,
       unit AS nn_unit, ROUND(dist, 4) AS nn_dist
FROM ranked WHERE rk <= 3
"""


RING_N = 72  # 5184 tiles > knn dense_max(4096) -> exercises the ring search


def q_knn_tiles_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-partitioned kNN through the LARGE-index tier: 5184 tiles
    force the vectorized ring search (candidate window (2R+1)^2 per
    point instead of a dense distance matrix).  Same output contract as
    knn_tiles; the oracle cross-joins the full grid."""
    df = doc_geocode(_docs(spark, sf_dir)).where(F.col("doc_id") % 100 == 0)
    idx = TileIndex.regular_grid(T, RING_N, RING_N)
    out = knn_tiles(df, idx, k=3, keep=("doc_id",))
    return out.select(
        "doc_id",
        F.col("nn_rank").cast("int").alias("nn_rank"),
        "nn_gid",
        "nn_unit",
        F.round("nn_dist", 4).alias("nn_dist"),
    )


_RWX = (T.xmax - T.xmin) / RING_N
_RWY = (T.ymax - T.ymin) / RING_N
SQL_KNN_TILES_RING = f"""
WITH grid AS (
  SELECT (r * {RING_N} + c + 1) AS gid,
         't_' || CAST(r AS VARCHAR) || '_' || CAST(c AS VARCHAR) AS unit,
         {T.xmin} + c * {_RWX} AS xmin, {T.ymin} + r * {_RWY} AS ymin,
         {T.xmin} + (c + 1) * {_RWX} AS xmax, {T.ymin} + (r + 1) * {_RWY} AS ymax
  FROM (SELECT UNNEST(RANGE({RING_N})) AS c), (SELECT UNNEST(RANGE({RING_N})) AS r)
), pts AS (
  SELECT doc_id, x, y FROM ({GEO_SQL}) WHERE doc_id % 100 = 0
), dxy AS (
  SELECT p.doc_id, g.gid, g.unit,
         GREATEST(g.xmin - p.x, p.x - g.xmax, 0) AS dx,
         GREATEST(g.ymin - p.y, p.y - g.ymax, 0) AS dy
  FROM pts p, grid g
), ranked AS (
  SELECT doc_id, gid, unit, SQRT(dx * dx + dy * dy) AS dist,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY SQRT(dx * dx + dy * dy), gid) AS rk
  FROM dxy
)
SELECT doc_id, CAST(rk AS INT) AS nn_rank, CAST(gid AS BIGINT) AS nn_gid,
       unit AS nn_unit, ROUND(dist, 4) AS nn_dist
FROM ranked WHERE rk <= 3
"""


def q_percentile_heights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-tile exact percentile rollup (the heights-table analog:
    6 ground + 8 roof percentiles of n_chars)."""
    return percentile_heights(
        _assigned(spark, sf_dir), key="tile_gid", value="n_chars"
    )


def _pct_sql_cols() -> str:
    cols = []
    for prefix, ps in (
        ("ground", [0.00, 0.10, 0.20, 0.30, 0.40, 0.50]),
        ("roof", [0.00, 0.10, 0.25, 0.50, 0.75, 0.90, 0.95, 0.99]),
    ):
        for p in ps:
            cols.append(
                f"ROUND(QUANTILE_CONT(n_chars, {p}), 4) AS {prefix}_{int(round(p*100)):02d}"
            )
    return ",\n       ".join(cols)


SQL_PERCENTILE_HEIGHTS = f"""
SELECT tile_gid,
       {_pct_sql_cols()},
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM ({TILE_SQL})
GROUP BY tile_gid
"""


def q_heights_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: features ⋈ per-tile heights rollup (broadcast equi-join),
    the bag3d assembly join."""
    feats = _assigned(spark, sf_dir)
    heights = percentile_heights(feats, key="tile_gid", value="n_chars")
    joined = join_heights(
        feats.select("doc_id", "tile_gid"), heights, key="tile_gid",
        broadcast_heights=True,
    )
    return joined.select("doc_id", "tile_gid", "ground_50", "roof_90", "n_rows")


SQL_HEIGHTS_JOIN = f"""
WITH assigned AS ({TILE_SQL}),
heights AS (
  SELECT tile_gid, ROUND(QUANTILE_CONT(n_chars, 0.5), 4) AS ground_50,
         ROUND(QUANTILE_CONT(n_chars, 0.9), 4) AS roof_90,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM assigned GROUP BY tile_gid
)
SELECT a.doc_id, a.tile_gid, h.ground_50, h.roof_90, h.n_rows
FROM assigned a JOIN heights h USING (tile_gid)
"""


# ---------------------------------------------------------------------------
# training-data pipeline operators (dedup / textstats / similarity)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on sha2(text), min-id keeper."""
    from ..operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir))


SQL_DEDUP_EXACT = """
SELECT doc_id, text_sha,
       CAST(COUNT(*) OVER (PARTITION BY text_sha) AS BIGINT) AS group_size,
       doc_id <> MIN(doc_id) OVER (PARTITION BY text_sha) AS is_dup
FROM (SELECT doc_id, sha256(text) AS text_sha FROM documents)
"""


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-level exact line dedup (the C4 / RefinedWeb rule): a line
    of >= 10 chars may appear once across the corpus; lowest
    (doc_id, line_no) occurrence survives, documents are reassembled
    from their surviving lines (operators/dedup.line_dedup — two
    shuffles, pure JVM).  On the single-line fixture corpus this
    degenerates to whole-document corpus dedup (non-keeper exact dups
    come back empty), which still exercises the full
    split/window/reassemble machinery; the multi-line shape is pinned
    in tests/test_dedup.py."""
    from ..operators.dedup import line_dedup

    return line_dedup(_docs(spark, sf_dir))


SQL_LINE_DEDUP = """
WITH l AS (
  SELECT doc_id, UNNEST([{'line_no': i, 'line': arr[i]}
                         FOR i IN RANGE(1, LEN(arr) + 1)],
                        recursive := true)
  FROM (SELECT doc_id, string_split(COALESCE(text, ''), chr(10)) AS arr
        FROM documents)
), kept AS (
  SELECT doc_id, line_no, line FROM l WHERE LENGTH(line) < 10
  UNION ALL
  SELECT doc_id, line_no, line FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY line
                                 ORDER BY doc_id, line_no) AS rn
    FROM l WHERE LENGTH(line) >= 10
  ) WHERE rn = 1
), reb AS (
  SELECT doc_id, STRING_AGG(line, chr(10) ORDER BY line_no) AS text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(reb.text, '') AS text
FROM documents d LEFT JOIN reb ON reb.doc_id = d.doc_id
"""


def q_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, quality scoring, language-ID, fingerprinting —
    all JVM expressions (operators/textstats.py)."""
    from ..operators.textstats import add_textstats

    return add_textstats(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "punct_ratio", "alpha_ratio",
        "stopword_ratio", "avg_token_len", "lang_pred", "fingerprint",
    )


def _sql_textstats() -> str:
    from ..operators.textstats import LANG_MARKERS, STOPWORDS, sql_fingerprint

    toks = r"REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')"
    n_tokens = (
        f"CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 ELSE LEN({toks}) END"
    )
    stop_list = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
    n_stop = f"LEN(LIST_FILTER({toks}, t -> LIST_CONTAINS({stop_list}, LOWER(t))))"
    # explicit FLOOR half-away form (see textstats._ratio6): identical
    # IEEE ops in both engines, unlike engine-native ROUND(x, 6)
    ratio = lambda num, den: (
        f"CASE WHEN {den} > 0 THEN "
        f"FLOOR(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) * 1000000.0 "
        f"+ 0.5) / 1000000.0 ELSE 0.0 END"
    )
    hits = {
        lang: (
            "LEN(LIST_FILTER(LIST_TRANSFORM(" + toks + ", t -> LOWER(t)), "
            "t -> LIST_CONTAINS([" + ", ".join(f"'{w}'" for w in ws) + "], t)))"
        )
        for lang, ws in LANG_MARKERS.items()
    }
    # replicate the fold order of textstats.lang_scores exactly:
    # langs ascending, strictly-greater replaces
    pred = (
        f"CASE WHEN {hits['nl']} > GREATEST({hits['de']}, {hits['en']}, {hits['fr']}) THEN 'nl' "
        f"WHEN {hits['fr']} > GREATEST({hits['de']}, {hits['en']}) THEN 'fr' "
        f"WHEN {hits['en']} > {hits['de']} THEN 'en' ELSE 'de' END"
    )
    punct_ratio = ratio("LENGTH(REGEXP_REPLACE(text, '[^.,;:!?]', '', 'g'))", "LENGTH(text)")
    alpha_ratio = ratio("LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g'))", "LENGTH(text)")
    stop_ratio = ratio(n_stop, n_tokens)
    nonws = "LENGTH(REGEXP_REPLACE(text, '\\s', '', 'g'))"
    avg_tok = ratio(nonws, n_tokens)
    fp = sql_fingerprint()
    return f"""
SELECT doc_id,
       CAST({n_tokens} AS BIGINT) AS n_tokens,
       {punct_ratio} AS punct_ratio,
       {alpha_ratio} AS alpha_ratio,
       {stop_ratio} AS stopword_ratio,
       {avg_tok} AS avg_token_len,
       {pred} AS lang_pred,
       CAST({fp} AS BIGINT) AS fingerprint
FROM documents
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the simhash pair
    graph (operators/dedup.connected_components, iterative min-label
    propagation) — component = min reachable doc_id, i.e. the canonical
    keeper.  The oracle unrolls the propagation a fixed 8 rounds in SQL
    (each round = neighbor-min THEN pointer jump, so reach roughly
    doubles per round — ~2^8 coverage); the engine iterates to
    convergence, so they agree whenever the engine converges within 8
    such rounds (asserted on the fixture by
    tests/test_dedup.py::test_clusters_converge_within_oracle_unroll;
    the operator's own pytest also covers deep path graphs vs
    brute-force union-find)."""
    from ..operators.dedup import connected_components, simhash_near_dups

    pairs = simhash_near_dups(_docs(spark, sf_dir), max_hamming=8)
    return connected_components(pairs)


def _sql_dedup_clusters() -> str:
    # Each round: (1) take the min over neighbors' labels, then
    # (2) pointer-jump — replace the label by that node's own label
    # (label-of-label).  The compression makes reach double-ish per
    # round, so 8 rounds cover any diameter the fixture graphs can
    # have; both engines converge to the SAME fixpoint (min reachable
    # id), so the unroll only needs to reach it, not mirror the
    # engine's iteration count.
    # AS MATERIALIZED everywhere: each round references the previous
    # CTE twice, so default inlining would copy the (already large)
    # simhash subtree 2^rounds times — enough to exhaust file handles
    # just opening the parquet scan per copy
    rounds = 8
    ctes = ["l0 AS MATERIALIZED (SELECT id, id AS c FROM n)"]
    for k in range(1, rounds + 1):
        ctes.append(f"""la{k} AS MATERIALIZED (
  SELECT l.id, LEAST(l.c, COALESCE(m.mc, l.c)) AS c
  FROM l{k - 1} l LEFT JOIN (
    SELECT e.src AS id, MIN(p.c) AS mc
    FROM e JOIN l{k - 1} p ON p.id = e.dst GROUP BY e.src
  ) m USING (id)
), l{k} AS MATERIALIZED (
  SELECT t.id, LEAST(t.c, j.c) AS c
  FROM la{k} t JOIN la{k} j ON j.id = t.c
)""")
    return f"""
WITH pairs AS MATERIALIZED ({_sql_dedup_simhash()}),
e AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
n AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
{", ".join(ctes)}
SELECT id, c AS component FROM l{rounds}
"""


def q_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 (JVM higher-order functions + ranking
    window); queries = vec_id % 100 == 0."""
    from ..operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_topk(emb, emb.where(F.col("vec_id") % 100 == 0), k=5)


SQL_ANN_COSINE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 100 = 0
), c AS (
  SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
), s AS (
  SELECT query_id, cand_id,
         ROUND(LIST_DOT_PRODUCT(qv, cv)
               / (SQRT(LIST_DOT_PRODUCT(qv, qv)) * SQRT(LIST_DOT_PRODUCT(cv, cv))), 6)
           AS cosine
  FROM c, q WHERE cand_id <> query_id
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rk
  FROM s
)
SELECT query_id, CAST(rk AS INT) AS rank, cand_id, cosine FROM r WHERE rk <= 5
"""


def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup pairs, blocked on (lang, len/64) —
    pure JVM higher-order functions (operators/dedup.py)."""
    from ..operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.5)


SQL_DEDUP_NGRAM = r"""
WITH t AS (
  SELECT doc_id, lang, n_chars // 64 AS blk,
         LIST_DISTINCT([ARRAY_TO_STRING(toks[i:i+2], ' ')
                        FOR i IN RANGE(1, GREATEST(LEN(toks) - 2, 0) + 1)]) AS grams
  FROM (SELECT doc_id, lang, n_chars,
               REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+') AS toks
        FROM documents)
), tc AS (
  -- block cap twin of ngram_jaccard_pairs(block_cap=4096)
  SELECT * FROM t
  QUALIFY ROW_NUMBER() OVER (PARTITION BY lang, blk ORDER BY doc_id) <= 4096
)
SELECT id_a, id_b, jaccard FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         LEN(LIST_INTERSECT(a.grams, b.grams)) * 1.0
           / NULLIF(LEN(LIST_DISTINCT(LIST_CONCAT(a.grams, b.grams))), 0)
           AS jaccard
  FROM tc a JOIN tc b
    ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
) WHERE jaccard >= 0.5
"""


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact all-pairs verify stage)."""
    from ..operators.dedup import embedding_near_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dups(emb, threshold=0.4)


# quantize to integers (exact in float64) so the dot products are
# order-independent — bit-identical between numpy matmul and the SQL
# fold (see operators/dedup.embedding_near_dups)
SQL_DEDUP_EMBEDDING = """
WITH e AS (
  SELECT vec_id,
         LIST_TRANSFORM(CAST(embedding AS DOUBLE[]),
                        x -> ROUND(x * 1048576.0)) AS q
  FROM embeddings
), n AS (
  SELECT vec_id, q, SQRT(LIST_DOT_PRODUCT(q, q)) AS nrm FROM e
)
SELECT id_a, id_b, cosine FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         LIST_DOT_PRODUCT(a.q, b.q) / (a.nrm * b.nrm) AS cosine
  FROM n a, n b WHERE a.vec_id < b.vec_id
) WHERE cosine >= 0.4
"""


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64 perms) -> exact-dedup prefilter -> 16-band LSH with a
    deterministic bucket cap -> exact shingle-Jaccard verify.  The
    whole funnel (shingle rolling hash, Mersenne-permutation minima,
    band keys, cap, verification) is recomputed by the DuckDB oracle
    with HUGEINT arithmetic — full hash-compare, no longer rows-only."""
    from ..operators.dedup import minhash_near_dups

    return minhash_near_dups(_docs(spark, sf_dir), threshold=0.5)


def _sql_byte(h: str, pos: str, guard: bool = False) -> str:
    """SQL for the UTF-8 byte value at 1-based byte position `pos` of a
    hex-encoded blob expression `h` (DuckDB hex() = uppercase).  Each
    byte is two hex chars; a nibble is ascii(c) - 48 for digits / - 55
    for A-F — the same hex->int trick as _sql_hex15.  With guard=True,
    positions past the end yield 0 (the engine's zero-padding)."""

    def nib(p):
        c = f"ascii({h}[{p}:{p}])"
        return f"({c} - CASE WHEN {c} <= 57 THEN 48 ELSE 55 END)"

    v = f"({nib(f'2*({pos}) - 1')} * 16 + {nib(f'2*({pos})')})"
    if guard:
        return f"CASE WHEN LENGTH({h}) >= 2*({pos}) THEN {v} ELSE 0 END"
    return v


def _sql_dedup_minhash() -> str:
    # BYTE-LEVEL ORACLE (round-4, VERDICT #6): the engine hashes UTF-8
    # BYTES (dedup._shingle_hashes / _token_hashes); these SQL twins now
    # recompute the same byte values from hex(encode(text)) instead of
    # ascii(text[i:i]) per CHARACTER, so minhash/simhash hashes agree on
    # non-ASCII corpora too (multibyte agreement is pinned by
    # tests/test_dedup.py::test_minhash_simhash_byte_oracle_non_ascii).
    # Remaining boundary rule: tokenization is python str.split() vs SQL
    # regex '\\s+' — identical unless the corpus contains NON-ASCII
    # WHITESPACE (U+00A0, U+3000, ...), which the fixtures avoid.
    from ..operators.dedup import MERSENNE, _perm_params, _token_weights

    cap = 128
    # shingle weights: descending powers P^(k-1-j), k=5 (dedup._shingle_hashes)
    w = [int(v) for v in _token_weights(5)][::-1]
    # shingle i (1-based over BYTES): sum_j byte(i+j) * P^(4-j); i+4 <= nb
    # inside the RANGE, so no end guard needed
    sh_terms = " + ".join(
        f"CAST({_sql_byte('hx', f'i + {j}')} AS HUGEINT) * {w[j]}"
        for j in range(5)
    )
    # nb < 5: the engine zero-pads the byte string to one shingle; the
    # guarded byte expr gives 0 past the end, reproducing it at i=1
    pad_terms = " + ".join(
        f"CAST({_sql_byte('hx', str(j + 1), guard=True)} AS HUGEINT) * {w[j]}"
        for j in range(5)
    )
    a, b = _perm_params(64)
    mh_cols = ",\n         ".join(
        f"LIST_MIN(LIST_TRANSFORM(shingles, s -> (CAST({int(a[i])} AS HUGEINT)"
        f" * (s % {MERSENNE}) + {int(b[i])}) % {MERSENNE})) AS mh{i}"
        for i in range(64)
    )
    band_keys = ", ".join(
        "CAST(mh%d AS VARCHAR) || ',' || CAST(mh%d AS VARCHAR) || ',' || "
        "CAST(mh%d AS VARCHAR) || ',' || CAST(mh%d AS VARCHAR)"
        % (4 * bb, 4 * bb + 1, 4 * bb + 2, 4 * bb + 3)
        for bb in range(16)
    )
    # estimated-jaccard screen: mirrors minhash_near_dups est_margin
    import math

    est_min = int(math.ceil(64 * (0.5 - 0.15)))
    est_sum = " + ".join(
        f"CASE WHEN ma.mh{i} = mb.mh{i} THEN 1 ELSE 0 END" for i in range(64)
    )
    return f"""
WITH keepers AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
  FROM (SELECT doc_id, text,
               MIN(doc_id) OVER (PARTITION BY sha256(text)) AS keeper
        FROM documents)
  WHERE doc_id = keeper
), sh AS (
  SELECT doc_id,
         LIST_DISTINCT(CASE WHEN nb >= 5 THEN
           [({sh_terms}) % 18446744073709551616
            FOR i IN RANGE(1, nb - 3)]
         ELSE [({pad_terms}) % 18446744073709551616] END) AS shingles
  FROM keepers
), mh AS (
  SELECT doc_id, shingles,
         {mh_cols}
  FROM sh
), banded AS (
  SELECT doc_id, UNNEST(RANGE(16)) AS band_id,
         UNNEST([{band_keys}]) AS band_key
  FROM mh
), capped AS (
  SELECT doc_id, band_id, band_key FROM banded
  QUALIFY ROW_NUMBER() OVER (PARTITION BY band_id, band_key
                             ORDER BY doc_id) <= {cap}
), rawpairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM capped a JOIN capped b USING (band_id, band_key)
  WHERE a.doc_id < b.doc_id
), pairs AS (
  -- estimated-jaccard screen: >= est_min matching signature components
  SELECT id_a, id_b FROM rawpairs
  JOIN mh ma ON ma.doc_id = id_a
  JOIN mh mb ON mb.doc_id = id_b
  WHERE ({est_sum}) >= {est_min}
)
SELECT id_a, id_b, jaccard FROM (
  SELECT id_a, id_b,
         LEN(LIST_INTERSECT(sa.shingles, sb.shingles)) * 1.0
           / (LEN(sa.shingles) + LEN(sb.shingles)
              - LEN(LIST_INTERSECT(sa.shingles, sb.shingles))) AS jaccard
  FROM pairs JOIN sh sa ON sa.doc_id = pairs.id_a
             JOIN sh sb ON sb.doc_id = pairs.id_b
) WHERE jaccard >= 0.5
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit signature from polynomial token
    hashes, 4x16-bit banding, bit_count(xor) <= 8 verification — the
    banding/join/verify stages are pure JVM expressions; the DuckDB
    oracle recomputes token hashes, majority-vote bits, bands, and
    Hamming distances exactly."""
    from ..operators.dedup import simhash_near_dups

    return simhash_near_dups(_docs(spark, sf_dir), max_hamming=8)


def _sql_dedup_simhash() -> str:
    from ..operators.dedup import _TOKEN_MAX_BYTES, _token_weights

    w = [int(v) for v in _token_weights(_TOKEN_MAX_BYTES)]
    # byte-level (VERDICT r3 #6): hash the first 32 UTF-8 BYTES of each
    # token (hex-encoded once per token by the outer LIST_TRANSFORM),
    # matching dedup._token_hashes on non-ASCII corpora; the guarded
    # byte expr yields 0 past the end = the engine's zero padding
    tok_terms = " + ".join(
        f"CAST({_sql_byte('h', str(j + 1), guard=True)} AS HUGEINT) * {w[j]}"
        for j in range(_TOKEN_MAX_BYTES)
    )
    bit_exprs = ",\n         ".join(
        f"CASE WHEN LEN(hs) = 0 THEN 0"
        f" WHEN LEN(LIST_FILTER(hs, h -> (h // {1 << j}) % 2 = 1)) * 2 >= LEN(hs)"
        f" THEN 1 ELSE 0 END"
        for j in range(64)
    )
    band_vals = ", ".join(
        " + ".join(f"bits[{16 * bb + j + 1}] * {1 << j}" for j in range(16))
        for bb in range(4)
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN CAST([] AS VARCHAR[])
              ELSE REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') END AS tk
  FROM documents
), th AS (
  SELECT doc_id,
         LIST_TRANSFORM(LIST_TRANSFORM(tk, t -> hex(encode(t))),
                        h -> ({tok_terms}) % 18446744073709551616) AS hs
  FROM toks
), bm AS (
  SELECT doc_id,
         [{bit_exprs}] AS bits
  FROM th
), banded AS (
  SELECT doc_id, bits, UNNEST(RANGE(4)) AS band_id,
         UNNEST([{band_vals}]) AS band_val
  FROM bm
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.bits AS ba, b.bits AS bb
  FROM banded a JOIN banded b USING (band_id, band_val)
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM (
  SELECT id_a, id_b,
         CAST(LIST_SUM([CASE WHEN ba[j+1] <> bb[j+1] THEN 1 ELSE 0 END
                        FOR j IN RANGE(64)]) AS INT) AS hamming
  FROM pairs
) WHERE hamming <= 8
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 cosine (the scale path of
    ann_cosine).  Buckets come from integer-quantized hyperplane dots
    (exact in float64), so the DuckDB oracle recomputes the SAME
    buckets, candidates, and re-scored ranking bit-for-bit — recall is
    additionally gated vs brute force in tests/test_similarity.py."""
    from ..operators.similarity import lsh_ann_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    return lsh_ann_topk(
        emb, emb.where(F.col("vec_id") % 100 == 0), dim=dim, k=5
    )


def _sql_projection_cte(dim: int, n_cols: int) -> str:
    """SQL twin of similarity._projection (splitmix64 over d*2^20 + c)
    as CTE stages ending in `w(c, wv)`.  Each mod-2^64 multiply is
    staged as a*b_lo + ((a*b_hi) mod 2^32)*2^32 so no intermediate
    exceeds HUGEINT (a plain product of two ~2^64 values overflows
    int128)."""
    from ..operators.similarity import _SM_C0, _SM_K1, _SM_K2

    two64 = 1 << 64

    def mulmod(a: str, b: int) -> str:
        b_lo, b_hi = b & 0xFFFFFFFF, b >> 32
        return (f"((({a}) * {b_lo}) % {two64} + "
                f"((({a}) * {b_hi}) % 4294967296) * 4294967296) % {two64}")

    return f"""wp AS (
  SELECT d, c,
         CAST(d * 1048576 + c AS HUGEINT) + CAST({_SM_C0} AS HUGEINT) AS z0
  FROM RANGE({dim}) t(d), RANGE({n_cols}) u(c)
), w1 AS (
  SELECT d, c, {mulmod("xor(z0 % " + str(two64) + ", z0 // 1073741824)", _SM_K1)} AS z1 FROM wp
), w2 AS (
  SELECT d, c, {mulmod("xor(z1, z1 // 134217728)", _SM_K2)} AS z2 FROM w1
), w3 AS (
  SELECT d, c, xor(z2, z2 // 2147483648) AS z3 FROM w2
), w AS (
  SELECT c, LIST(CAST(z3 // 17592186044416 - 524288 AS DOUBLE) ORDER BY d) AS wv
  FROM w3 GROUP BY c
)"""


def _sql_ann_lsh() -> str:
    """Oracle twin of q_ann_lsh: same splitmix64 hyperplane weights,
    same quantized sign tests, same candidate join + exact re-score.
    The embedding dim is pinned to 64 (the testdata width; q_ann_lsh
    infers it at runtime)."""
    n_planes, tables, k, dim = 6, 24, 5, 64
    return f"""
WITH e AS (
  SELECT vec_id,
         LIST_TRANSFORM(CAST(embedding AS DOUBLE[]),
                        x -> ROUND(x * 1048576.0)) AS q
  FROM embeddings
), {_sql_projection_cte(dim, n_planes * tables)}, sig AS (
  SELECT e.vec_id, w.c // {n_planes} AS table_id,
         SUM(CASE WHEN LIST_DOT_PRODUCT(e.q, w.wv) > 0
                  THEN (CAST(1 AS BIGINT) << (w.c % {n_planes})) ELSE 0 END) AS bucket
  FROM e, w
  GROUP BY e.vec_id, w.c // {n_planes}
), pairs AS (
  SELECT DISTINCT s2.vec_id AS query_id, s1.vec_id AS cand_id
  FROM sig s1 JOIN sig s2
    ON s1.table_id = s2.table_id AND s1.bucket = s2.bucket
  WHERE s2.vec_id % 100 = 0 AND s1.vec_id <> s2.vec_id
), v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings
), scored AS (
  SELECT p.query_id, p.cand_id,
         ROUND(LIST_DOT_PRODUCT(qv.dv, cv.dv)
               / (SQRT(LIST_DOT_PRODUCT(qv.dv, qv.dv))
                  * SQRT(LIST_DOT_PRODUCT(cv.dv, cv.dv))), 6) AS cosine
  FROM pairs p
  JOIN v cv ON cv.vec_id = p.cand_id
  JOIN v qv ON qv.vec_id = p.query_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, cand_id) AS rk
  FROM scored
)
SELECT query_id, CAST(rk AS INT) AS rank, cand_id, cosine
FROM ranked WHERE rk <= {k}
"""


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters over documents
    (operators/textstats.repetition_stats): duplicate-line fraction,
    duplicate-line character fraction, top-bigram occurrence fraction —
    exact-integer ratios, bit-identical to the SQL twin."""
    from ..operators.textstats import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


SQL_REPETITION = r"""
WITH lc AS (
  SELECT doc_id, line, COUNT(*) AS c, LENGTH(line) AS len
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, chr(10))) AS line
        FROM documents)
  GROUP BY doc_id, line
), lstats AS (
  SELECT doc_id,
         SUM(c) AS n_lines,
         COUNT(*) AS n_distinct,
         SUM(len * c) AS chars_all,
         SUM(CASE WHEN c > 1 THEN len * c ELSE 0 END) AS chars_dup
  FROM lc GROUP BY doc_id
), bc AS (
  SELECT doc_id, MAX(c) AS top_cnt, SUM(c) AS n_bi
  FROM (
    SELECT doc_id, bg, COUNT(*) AS c
    FROM (SELECT doc_id,
                 UNNEST([toks[i] || ' ' || toks[i+1]
                         FOR i IN RANGE(1, GREATEST(LEN(toks) - 1, 0) + 1)]) AS bg
          FROM (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+') AS toks
                FROM documents))
    GROUP BY doc_id, bg)
  GROUP BY doc_id
)
SELECT d.doc_id,
       1.0 - CAST(ls.n_distinct AS DOUBLE) / ls.n_lines AS dup_line_frac,
       CASE WHEN ls.chars_all > 0
            THEN CAST(ls.chars_dup AS DOUBLE) / ls.chars_all
            ELSE 0.0 END AS dup_line_char_frac,
       COALESCE(CAST(bc.top_cnt AS DOUBLE) / bc.n_bi, 0.0) AS top_bigram_frac
FROM documents d
JOIN lstats ls USING (doc_id)
LEFT JOIN bc USING (doc_id)
"""


def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% Bernoulli sample of documents keyed on doc_id
    (operators/sampling.hash_sample): sha2-hex-prefix threshold — same
    rows on every run, engine, and cluster size; map-only JVM filter."""
    from ..operators.sampling import hash_sample

    return hash_sample(
        _docs(spark, sf_dir).select("doc_id", "lang", "n_chars"),
        fraction=0.2, key_col="doc_id", seed="s1",
    )


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample — the training-mixture knob:
    keep 100% of 'zh'/'de' docs, 10% of 'en', 25% of everything else
    (the corpus has langs en/fr/es/zh/de)."""
    from ..operators.sampling import stratified_sample

    return stratified_sample(
        _docs(spark, sf_dir).select("doc_id", "lang", "n_chars"),
        fractions={"zh": 1.0, "de": 1.0, "en": 0.1},
        strata_col="lang", key_col="doc_id", seed="s2",
        default_fraction=0.25,
    )


def _sql_hex15(key_expr: str, seed: str) -> str:
    """DuckDB twin of sampling.hash_fraction_col: first 15 hex digits of
    sha256(key || seed) parsed as an integer (spelled out as 15
    positional ascii terms — DuckDB has no hex->int conv), / 16^15."""
    h = f"sha256(CAST({key_expr} AS VARCHAR) || '{seed}')"
    terms = " + ".join(
        f"(ascii(substr(h, {j + 1}, 1)) - CASE WHEN ascii(substr(h, {j + 1}, 1)) <= 57 "
        f"THEN 48 ELSE 87 END) * CAST({16 ** (14 - j)} AS BIGINT)"
        for j in range(15)
    )
    return f"(SELECT ({terms}) / 1152921504606846976.0 FROM (SELECT {h} AS h))"


SQL_SAMPLE_HASH = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE {_sql_hex15("doc_id", "s1")} < 0.2
"""

SQL_SAMPLE_STRATIFIED = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE {_sql_hex15("doc_id", "s2")} <
      CASE WHEN lang IN ('zh', 'de') THEN 1.0
           WHEN lang = 'en' THEN 0.1
           ELSE 0.25 END
"""


def q_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-mixture materialization
    (operators/sampling.weighted_mixture): 'zh' docs 2.5x, 'en' 0.4x,
    everything else 1x — floor(w) copies plus one more under the hash
    draw, copy_id tagging repeats.  Map-only sequence-explode."""
    from ..operators.sampling import weighted_mixture

    return weighted_mixture(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        weights={"zh": 2.5, "en": 0.4},
        strata_col="lang", key_col="doc_id", seed="m1",
    )


SQL_SAMPLE_MIXTURE = f"""
SELECT doc_id, lang, UNNEST(RANGE(1, n + 1)) AS copy_id FROM (
  SELECT doc_id, lang,
         CAST(FLOOR(w) AS BIGINT)
         + CASE WHEN {_sql_hex15("doc_id", "m1")} < w - FLOOR(w)
                THEN 1 ELSE 0 END AS n
  FROM (SELECT doc_id, lang,
               CASE WHEN lang = 'zh' THEN 2.5
                    WHEN lang = 'en' THEN 0.4
                    ELSE 1.0 END AS w
        FROM documents))
WHERE n > 0
"""


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota (operators/sampling.cap_per_key): keep at most
    20 docs per domain, the smallest-hash-draw 20 — the cap every web
    corpus applies so giant hosts can't dominate the mixture.  The
    domain is derived skewed on purpose (70% of docs land on one hot
    host) so the query exercises the skew-safe two-level selection:
    count → candidate pre-filter → bounded ~cap-row window, never a
    window over the raw hot group."""
    from ..operators.sampling import cap_per_key

    docs = _docs(spark, sf_dir).withColumn(
        "domain",
        F.when(F.col("doc_id") % 10 < 7, F.lit("bulk.example.com"))
        .otherwise(F.col("source")),
    ).select("doc_id", "domain", "lang", "n_chars")
    return cap_per_key(
        docs, cap=20, key_col="domain", row_key_col="doc_id", seed="dc1"
    )


SQL_DOMAIN_CAP = f"""
SELECT doc_id, domain, lang, n_chars FROM (
  SELECT doc_id, domain, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY domain
                            ORDER BY {_sql_hex15("doc_id", "dc1")}, doc_id)
           AS rn
  FROM (SELECT doc_id,
               CASE WHEN doc_id % 10 < 7 THEN 'bulk.example.com'
                    ELSE source END AS domain,
               lang, n_chars
        FROM documents))
WHERE rn <= 20
"""


def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (operators/textstats.scrub_pii) as a contract
    query: the shared fixture contains no PII, so both engine and
    oracle first INJECT deterministic doc_id-derived emails / IPv4s /
    phone numbers into the text (identical format_string/printf
    expressions), then scrub.  The value hash covers the full scrubbed
    text byte-for-byte plus the per-category counts, so a divergence in
    pattern semantics (the round-4 Java-\\b-vs-RE2 surface) fails the
    gate rather than hiding in an identity transform."""
    from ..operators.textstats import scrub_pii

    d = F.col("doc_id")
    injected = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % 3 == 0,
                F.format_string(
                    " contact user%d@mail%d.example.com", d, F.pmod(d, F.lit(7))
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 4 == 0,
                F.format_string(
                    " from %d.%d.%d.%d",
                    F.pmod(d, F.lit(223)) + 1,
                    F.pmod(d * 7, F.lit(256)),
                    F.pmod(d * 13, F.lit(256)),
                    F.pmod(d, F.lit(254)) + 1,
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 5 == 0,
                F.format_string(
                    " call +1 (%03d) %03d-%04d",
                    F.pmod(d, F.lit(900)) + 100,
                    F.pmod(d * 3, F.lit(900)) + 100,
                    F.pmod(d * 17, F.lit(10000)),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return scrub_pii(injected)


def _sql_pii_injected() -> str:
    """DuckDB twin of q_scrub_pii's injection subquery."""
    return """
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN printf(' contact user%d@mail%d.example.com',
                             doc_id, doc_id % 7)
                 ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN printf(' from %d.%d.%d.%d',
                             doc_id % 223 + 1, (doc_id * 7) % 256,
                             (doc_id * 13) % 256, doc_id % 254 + 1)
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN printf(' call +1 (%03d) %03d-%04d',
                             doc_id % 900 + 100, (doc_id * 3) % 900 + 100,
                             (doc_id * 17) % 10000)
                 ELSE '' END AS text
  FROM documents
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (operators/packing.pack_sequences):
    concatenate each uniform shard in doc_id order and cut every 512
    tokens; each doc reports the (shard, seq_id, seq_off) it lands at
    and whether it spans a cut.  One window over uniform shards — no
    hot key can exist, so the window-partition skew hazard is absent by
    construction."""
    from ..operators.packing import pack_sequences

    return pack_sequences(
        _docs(spark, sf_dir).select("doc_id", "text"),
        n_ctx=512, n_shards=8,
    )


def _sql_pack_sequences() -> str:
    from ..operators.packing import sql_pack_sequences

    return sql_pack_sequences(n_ctx=512, n_shards=8)


def q_pack_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The writer half of packing (operators/packing.emit_sequences):
    materialize each (shard, seq_id) training sequence as its
    space-joined n_ctx-token text.  The value hash covers every token
    of the packed corpus in order, so the layout math AND the
    reassembly are both certified."""
    from ..operators.packing import emit_sequences

    return emit_sequences(
        _docs(spark, sf_dir).select("doc_id", "text"), n_ctx=512, n_shards=8
    )


def _sql_pack_emit() -> str:
    from ..operators.packing import sql_emit_sequences

    return sql_emit_sequences(n_ctx=512, n_shards=8)


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + canonical-URL dedup
    (operators/urltools): the fixture has no url column, so both
    engine and oracle derive a deliberately messy deterministic URL
    per doc (case-mixed scheme/host, default ports, unsorted + tracking
    query params, fragments, trailing slashes), canonicalize, and keep
    the lowest doc_id per canonical form.  doc_id%50 sites x doc_id%20
    pages make distinct docs collide on the same canonical URL, so the
    dedup is real, not an identity pass."""
    from ..operators.urltools import url_dedup

    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("HTTP://WWW.Site")).otherwise(
            F.lit("https://www.site")
        ),
        F.pmod(d, F.lit(50)).cast("string"),
        F.lit(".Example.COM"),
        F.when((d % 4 == 0) & (d % 2 == 0), F.lit(":80"))
        .when((d % 4 == 1) & (d % 2 == 1), F.lit(":443"))
        .otherwise(F.lit("")),
        F.format_string("/page%d", F.pmod(d, F.lit(20))),
        F.when(d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("?b=2&a=1"))
        .when(d % 5 == 1, F.lit("?a=1&b=2"))
        .when(d % 5 == 2, F.lit("?a=1&utm_source=x&b=2"))
        .when(d % 5 == 3, F.lit("?utm_campaign=z"))
        .otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    urls = _docs(spark, sf_dir).select("doc_id", url.alias("url"))
    return url_dedup(urls)


def _sql_url_dedup() -> str:
    from ..operators.urltools import sql_url_canonical

    inj = """
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'HTTP://WWW.Site'
              ELSE 'https://www.site' END
         || CAST(doc_id % 50 AS VARCHAR) || '.Example.COM'
         || CASE WHEN doc_id % 4 = 0 AND doc_id % 2 = 0 THEN ':80'
                 WHEN doc_id % 4 = 1 AND doc_id % 2 = 1 THEN ':443'
                 ELSE '' END
         || printf('/page%d', doc_id % 20)
         || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN '?b=2&a=1'
                 WHEN doc_id % 5 = 1 THEN '?a=1&b=2'
                 WHEN doc_id % 5 = 2 THEN '?a=1&utm_source=x&b=2'
                 WHEN doc_id % 5 = 3 THEN '?utm_campaign=z'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN '#sec' ELSE '' END AS url
  FROM documents
"""
    return f"""
WITH urls AS ({inj}),
canon AS (SELECT doc_id, url, {sql_url_canonical("url")} AS url_canon
          FROM urls)
SELECT c.url_canon, c.doc_id, c.url
FROM canon c
JOIN (SELECT url_canon, MIN(doc_id) AS doc_id
      FROM canon GROUP BY url_canon) s
  USING (url_canon, doc_id)
"""


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-span detection (operators/spans.duplicate_spans):
    maximal word-6-gram runs shared verbatim by >= 2 documents — the
    distributed exact-substring dedup of Lee et al., as n-gram
    postings (hashed JVM-side) + islands-and-gaps merge.  The oracle
    replays the pipeline on gram STRINGS, so a hash-green match also
    certifies the xxhash64 posting shuffle introduced no collision on
    this corpus."""
    from ..operators.spans import duplicate_spans

    out = duplicate_spans(
        _docs(spark, sf_dir).select("doc_id", "text"), n=6, min_docs=2
    )
    return out.select(
        "doc_id",
        F.col("span_id").cast("bigint").alias("span_id"),
        F.col("start_tok").cast("bigint").alias("start_tok"),
        F.col("end_tok").cast("bigint").alias("end_tok"),
        F.col("n_dup_grams").cast("bigint").alias("n_dup_grams"),
    )


def _sql_dup_spans() -> str:
    from ..operators.spans import sql_duplicate_spans

    inner = sql_duplicate_spans(n=6, min_docs=2)
    return f"""
SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(end_tok AS BIGINT) AS end_tok,
       CAST(n_dup_grams AS BIGINT) AS n_dup_grams
FROM ({inner})
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution as-of join (operators/asof.as_of_join):
    every purchase event gains the latest click event of the same user
    at-or-before the purchase timestamp — the union-and-window as-of
    (pure JVM, no range-join pair blowup), on the hot-key-safe
    TIME-BUCKETED path (ts_bucket_s): keyed windows run only within
    (user, day) buckets and the latest click state is prefix-carried
    across buckets over the small per-(user, bucket) summary, so a
    single hyperactive user can never pin one task.  The oracle
    replays the equivalent single union + LAST_VALUE IGNORE NULLS
    window (the two paths are bit-identical by construction), not
    DuckDB's ASOF JOIN, so tie-resolution is pinned to the same total
    order in both engines."""
    from ..operators.asof import as_of_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    out = as_of_join(
        purchases, clicks, on="user_id",
        ts_col="ts", right_id_col="event_id", right_cols=["value"],
        ts_bucket_s=86_400.0,
    )
    # house determinism rule: timestamps leave contract queries as
    # formatted strings (pandas ns-vs-us resolution never reaches the
    # value hash)
    return out.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "value",
        "event_id_r",
        F.date_format("ts_r", "yyyy-MM-dd HH:mm:ss").alias("ts_r"),
        "value_r",
    )


def _sql_asof_join() -> str:
    from ..operators.asof import sql_as_of_join

    inner = sql_as_of_join(
        left_sql="SELECT event_id, user_id, ts, value FROM events "
                 "WHERE event_type = 'purchase'",
        right_sql="SELECT event_id, user_id, ts, value FROM events "
                  "WHERE event_type = 'click'",
        on="user_id",
        left_cols=["event_id", "user_id", "ts", "value"],
        ts_col="ts", right_id_col="event_id", right_cols=["value"],
    )
    return f"""
SELECT event_id, user_id,
       STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ts, value,
       event_id_r,
       STRFTIME(ts_r, '%Y-%m-%d %H:%M:%S') AS ts_r, value_r
FROM ({inner})
"""


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup (operators/incremental): corpus =
    docs with doc_id % 3 != 0 registered as a text_sha-bucketed state
    table; batch = the remaining third.  The fixture has no exact text
    dups, so (url_dedup-style) every 5th doc's content is replaced by
    a deterministic boilerplate string shared across doc_ids — those
    collide with the corpus or within the batch and are rejected; the
    rest are admitted.  Measures the real steady-state path: register
    (one corpus shuffle) + increment (batch-only shuffle, bucketed
    anti-join)."""
    from ..operators.incremental import dedup_increment, register_corpus

    d = F.col("doc_id")
    content = F.when(
        d % 5 == 0, F.format_string("boilerplate %d", F.pmod(d, F.lit(70)))
    ).otherwise(F.col("text"))
    docs = _docs(spark, sf_dir).select("doc_id", content.alias("text"))
    table = "b3d_inc_contract"
    register_corpus(
        spark, docs.where(d % 3 != 0), table, n_buckets=8
    )
    return dedup_increment(spark, docs.where(d % 3 == 0), table)


def _sql_dedup_incremental() -> str:
    from ..operators.incremental import sql_dedup_increment

    derived = """
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN printf('boilerplate %d', doc_id % 70)
              ELSE text END AS text
  FROM documents
"""
    return sql_dedup_increment(
        batch_sql=f"SELECT * FROM ({derived}) WHERE doc_id % 3 = 0",
        corpus_sql=f"SELECT * FROM ({derived}) WHERE doc_id % 3 <> 0",
    )


def q_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor-policy dedup (operators/dedup.cluster_survivors): the
    simhash near-dup clusters of dedup_clusters, but keeping the
    LONGEST document of each cluster (RefinedWeb practice) instead of
    the min id — argmax by (token count DESC, doc_id ASC) via one
    groupBy-max-struct, no window over cluster members (a boilerplate
    mega-cluster cannot straggle).  The oracle reuses the 8-round
    unrolled label SQL plus a max/tie-min join pair."""
    from ..operators.dedup import (
        cluster_survivors,
        connected_components,
        simhash_near_dups,
    )
    from ..operators.textstats import token_count

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    labels = connected_components(simhash_near_dups(_docs(spark, sf_dir),
                                                    max_hamming=8))
    out = cluster_survivors(
        labels, docs, score=token_count(F.col("text")).cast("bigint")
    )
    return out.select(
        "doc_id",
        F.col("component").cast("bigint").alias("component"),
        F.col("score").cast("bigint").alias("score"),
        "is_kept",
    )


def _sql_cluster_survivors() -> str:
    from ..operators.textstats import sql_token_count

    labels = _sql_dedup_clusters()
    return f"""
WITH labels AS ({labels}),
scored AS (
  SELECT doc_id, CAST({sql_token_count("text")} AS BIGINT) AS score
  FROM documents
),
j AS (
  SELECT s.doc_id, COALESCE(l.component, s.doc_id) AS component, s.score
  FROM scored s LEFT JOIN labels l ON l.id = s.doc_id
),
mx AS (SELECT component, MAX(score) AS mxs FROM j GROUP BY component),
best AS (
  SELECT j.component, MIN(j.doc_id) AS best_id
  FROM j JOIN mx ON j.component = mx.component AND j.score = mx.mxs
  GROUP BY j.component
)
SELECT j.doc_id, CAST(j.component AS BIGINT) AS component, j.score,
       j.doc_id = b.best_id AS is_kept
FROM j JOIN best b USING (component)
"""


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary (operators/textstats.vocab_topk): the 200
    most frequent whitespace tokens with counts and ranks —
    TakeOrderedAndProject top-k, never a full vocabulary sort; ties at
    the boundary pinned by (freq DESC, token ASC)."""
    from ..operators.textstats import vocab_topk

    return vocab_topk(_docs(spark, sf_dir).select("text"), k=200)


def _sql_vocab_topk() -> str:
    from ..operators.textstats import sql_vocab_topk

    return sql_vocab_topk(k=200)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.decontaminate): docs
    with doc_id % 50 == 0 play the eval suite; every other doc sharing
    at least one word 4-gram with it is flagged with its shared-gram
    count.  The benchmark gram set broadcasts; the training side never
    shuffles."""
    from ..operators.dedup import decontaminate

    docs = _docs(spark, sf_dir)
    train = docs.where(F.col("doc_id") % 50 != 0)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    return decontaminate(train, bench, n=4)


# gram twin of SQL_DEDUP_NGRAM (n=4); engine counts stable gram hashes,
# the oracle counts the strings — equal modulo ~1e-13 collisions
SQL_DECONTAMINATE = r"""
WITH g AS (
  SELECT doc_id, UNNEST(LIST_DISTINCT(
           [ARRAY_TO_STRING(toks[i:i+3], ' ')
            FOR i IN RANGE(1, GREATEST(LEN(toks) - 3, 0) + 1)])) AS gram
  FROM (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+') AS toks
        FROM documents)
)
SELECT tr.doc_id, COUNT(*) AS n_shared_grams
FROM (SELECT * FROM g WHERE doc_id % 50 != 0) tr
JOIN (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0) be USING (gram)
GROUP BY tr.doc_id
"""


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 cosine with the FROZEN coarse quantizer
    (operators/similarity.ivf_topk_frozen): centroids = the 64 lowest-id
    vectors on the 2^20 integer grid, so assignment argmin, probe
    selection and re-score are all exactly SQL-reproducible.  The Lloyd
    (k-means) quantizer keeps its pytest recall gate — float means are
    not bit-reproducible in ANSI SQL."""
    from ..operators.similarity import ivf_topk_frozen

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    return ivf_topk_frozen(
        emb, emb.where(F.col("vec_id") % 100 == 0), dim=dim, k=5,
        n_centroids=64, nprobe=8,
    )


def _sql_ann_ivf() -> str:
    """Oracle twin of q_ann_ivf.  All distance terms are integers on the
    2^20 quantization grid (|-2 v.c + c.c| < 2^47 over 64 dims — exact
    in float64/DOUBLE), so argmin ties, probe order and candidate sets
    are bit-identical to the numpy engine path."""
    n_centroids, nprobe, k = 64, 8, 5
    return f"""
WITH e AS (
  SELECT vec_id,
         LIST_TRANSFORM(CAST(embedding AS DOUBLE[]),
                        x -> ROUND(x * 1048576.0)) AS qv,
         CAST(embedding AS DOUBLE[]) AS dv
  FROM embeddings
), c AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cv
  FROM (SELECT vec_id, qv FROM e ORDER BY vec_id LIMIT {n_centroids})
), asg AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY -2 * LIST_DOT_PRODUCT(e.qv, c.cv)
                      + LIST_DOT_PRODUCT(c.cv, c.cv), c.cid) AS rn
    FROM e, c)
  WHERE rn = 1
), probe AS (
  SELECT query_id, cid FROM (
    SELECT e.vec_id AS query_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY -2 * LIST_DOT_PRODUCT(e.qv, c.cv)
                      + LIST_DOT_PRODUCT(c.cv, c.cv), c.cid) AS rn
    FROM e, c WHERE e.vec_id % 100 = 0)
  WHERE rn <= {nprobe}
), cand AS (
  SELECT p.query_id, a.vec_id AS cand_id
  FROM probe p JOIN asg a ON p.cid = a.cid
  WHERE a.vec_id <> p.query_id
), scored AS (
  SELECT cand.query_id, cand.cand_id,
         ROUND(LIST_DOT_PRODUCT(qe.dv, ce.dv)
               / (SQRT(LIST_DOT_PRODUCT(qe.dv, qe.dv))
                  * SQRT(LIST_DOT_PRODUCT(ce.dv, ce.dv))), 6) AS cosine
  FROM cand
  JOIN e ce ON ce.vec_id = cand.cand_id
  JOIN e qe ON qe.vec_id = cand.query_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, cand_id) AS rk
  FROM scored
)
SELECT query_id, CAST(rk AS INT) AS rank, cand_id, cosine
FROM ranked WHERE rk <= {k}
"""


def q_cell_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2-style quadtree cell ids (cells.py): Morton-encode each geocoded
    doc at res 6 plus its res-3 parent — the partition-pruning keys.
    Vectorized pandas UDFs over the numpy kernels; the oracle unrolls the
    bit interleave in SQL."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..cells import cell_encode, cell_parent

    # no type hints: `from __future__ import annotations` stringifies
    # them, which pandas_udf's signature inference rejects
    @pandas_udf("long")
    def enc6(xs, ys):
        return pd.Series(cell_encode(xs.to_numpy(), ys.to_numpy(), 6, T))

    @pandas_udf("long")
    def par3(cells):
        return pd.Series(cell_parent(cells.to_numpy(), 3))

    df = doc_geocode(_docs(spark, sf_dir))
    out = df.withColumn("cell6", enc6(F.col("x"), F.col("y")))
    return out.select(
        "doc_id", "cell6", par3(F.col("cell6")).alias("cell3")
    )


def _morton_sql(col: str, row: str, res: int) -> str:
    bits = " + ".join(
        f"(({col} // {1 << b}) % 2) * {1 << (2 * b)} + "
        f"(({row} // {1 << b}) % 2) * {1 << (2 * b + 1)}"
        for b in range(res)
    )
    return f"({res} * {1 << 58} + {bits})"


SQL_CELL_ENCODE = f"""
WITH g AS (
  SELECT doc_id,
         CAST(FLOOR((x - {T.xmin}) / ({T.xmax - T.xmin}) * 64) AS BIGINT) AS c6,
         CAST(FLOOR((y - {T.ymin}) / ({T.ymax - T.ymin}) * 64) AS BIGINT) AS r6
  FROM ({GEO_SQL})
)
SELECT doc_id,
       {_morton_sql('LEAST(c6, 63)', 'LEAST(r6, 63)', 6)} AS cell6,
       {_morton_sql('LEAST(c6, 63) // 8', 'LEAST(r6, 63) // 8', 3)} AS cell3
FROM g
"""


# ---------------------------------------------------------------------------
# multimodal columns (binary payload + typed metadata; operators/multimodal.py)
# ---------------------------------------------------------------------------

def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media blobs decoded to typed metadata by an Arrow-batched
    header parse.  Every field is a pure function of doc_id, so DuckDB
    recomputes the metadata without touching bytes."""
    from ..operators.multimodal import attach_media, decode_media_meta

    docs = _docs(spark, sf_dir).select("doc_id")
    return decode_media_meta(attach_media(docs))


_MM_FIELDS = """
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'video' ELSE 'image' END AS kind,
         CAST(64 + (CAST('0x' || h[1:4] AS BIGINT) % 960) AS INT) AS width,
         CAST(64 + (CAST('0x' || h[5:8] AS BIGINT) % 960) AS INT) AS height,
         CAST(1 + (CAST('0x' || h[9:10] AS BIGINT) % 4) AS INT) AS channels,
         CAST(CASE WHEN doc_id % 3 = 0
              THEN 2 + (CAST('0x' || h[11:12] AS BIGINT) % 7)
              ELSE 1 END AS INT) AS n_frames
  FROM (SELECT doc_id, sha256(CAST(doc_id AS VARCHAR)) AS h FROM documents)
"""

SQL_MULTIMODAL_META = f"""
SELECT doc_id, kind, width, height, channels, n_frames,
       CAST(10 + 32 * n_frames AS BIGINT) AS n_bytes
FROM ({_MM_FIELDS})
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sampling of video/image blobs (UDTF-style row
    expansion inside one mapInPandas pass; byte offsets oracle-checked,
    frame bytes themselves gated in tests/test_multimodal.py)."""
    from ..operators.multimodal import attach_media, frame_sample

    docs = _docs(spark, sf_dir).select("doc_id")
    return frame_sample(attach_media(docs), every=2).select(
        "doc_id", "frame_idx", "frame_off", "frame_len"
    )


SQL_FRAME_SAMPLE = f"""
SELECT doc_id, CAST(fi AS INT) AS frame_idx,
       CAST(10 + fi * 32 AS BIGINT) AS frame_off,
       CAST(32 AS BIGINT) AS frame_len
FROM ({_MM_FIELDS}), UNNEST(RANGE(0, n_frames, 2)) AS t(fi)
"""


# ---------------------------------------------------------------------------
# generic relational surface (S1/A/J/window coverage on the star schema)
# ---------------------------------------------------------------------------

def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation — the batch twin of
    the streaming pipeline (streaming/events.py uses the same window)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type", "n_events", "avg_value",
        )
    )


SQL_EVENTS_WINDOW = """
SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(AVG(value), 4) AS avg_value
FROM events GROUP BY 1, 2
"""


def q_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 events by value per type, via the salted
    two-level selection (operators/topk.salted_top_k — r6: the old
    single window held EVERY event of a type on one task; the
    (value DESC, event_id ASC) order is total, so the two-level
    selection is provably identical and the oracle keeps its single
    ROW_NUMBER)."""
    from ..operators.topk import salted_top_k

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return salted_top_k(
        ev, ["event_type"],
        [F.col("value").desc(), F.col("event_id").asc()],
        k=3, salt_col=F.col("event_id"),
    ).select(
        "event_type", F.col("rank").cast("int").alias("rank"),
        "event_id", "value",
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) on the HOT-KEY-SAFE
    two-pass path (operators/sessions.py, ts_bucket_s=3600): islands
    per (user, hour bucket), then a bounded per-user summary
    re-island — row-identical to the single-window plan (the fixture's
    sessions regularly span bucket boundaries, so the merge pass is
    exercised for real) and gated by the same single-window SQL
    oracle."""
    from ..operators.sessions import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(ev, gap_minutes=30.0, ts_bucket_s=3600)


SQL_SESSIONIZE = """
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR FLOOR(EPOCH(ts)) - FLOOR(EPOCH(LAG(ts) OVER w)) > 1800
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS session_seq
  FROM marked
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(FLOOR(EPOCH(MAX(ts))) - FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS duration_s,
       ROUND(SUM(value), 4) AS sum_value
FROM sess GROUP BY user_id, session_seq
"""


def q_events_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming twin of events_window: file-source stream ->
    watermark -> tumbling window agg -> AvailableNow drain to a memory
    sink (streaming/events.py).  Complete-mode output must equal the
    batch aggregation row-for-row — gated by the same SQL oracle."""
    from ..streaming.events import (
        hourly_counts, read_event_stream, run_stream_to_df)

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    return run_stream_to_df(hourly_counts(stream), output_mode="complete")


def q_user_totals_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user cumulative totals; the final emission per user equals the
    batch groupBy (the memory sink is reduced by max(n_events) so the
    oracle holds under any micro-batch split)."""
    from ..streaming.events import (
        auto_state_partitions, read_event_stream, run_stream_to_df,
        user_running_totals)

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    sink = run_stream_to_df(
        user_running_totals(stream), output_mode="update",
        state_partitions=auto_state_partitions(
            spark, f"{sf_dir}/events.parquet"),
    )
    return sink.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("sum_value").alias("sum_value"),
    )


def q_events_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: the events file is staged TWICE into the
    stream source (an at-least-once replay), and
    `withWatermark + dropDuplicates` must collapse it back to exactly
    the batch table — the oracle is simply the events table itself."""
    import os

    from ..scratch import scratch_dir
    from ..streaming.events import (
        auto_state_partitions, dedupe_events, read_event_stream,
        run_stream_to_df)

    src = os.path.abspath(f"{sf_dir}/events.parquet")
    # digest-keyed: stable across processes (hash(str) is randomized
    # per process and would leak a fresh tree per run)
    stage = scratch_dir("evdup", src)
    for name in ("dup1.parquet", "dup2.parquet"):
        link = os.path.join(stage, name)
        if not os.path.exists(link):
            os.symlink(src, link)
    stream = read_event_stream(spark, stage)
    deduped = dedupe_events(stream)
    sink = run_stream_to_df(
        deduped, output_mode="append",
        state_partitions=auto_state_partitions(
            spark, f"{sf_dir}/events.parquet"),
    )
    return sink.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "user_id", "event_type", "value",
    )


SQL_EVENTS_DEDUP_STREAM = """
SELECT event_id, STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       user_id, event_type, value
FROM events
"""


SQL_USER_TOTALS_STREAM = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY user_id
"""


SQL_TOP_EVENTS = """
SELECT event_type, CAST(rk AS INT) AS rank, event_id, value
FROM (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rk
  FROM events
) WHERE rk <= 3
"""


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped scan+agg (S1/A coverage).  Sums accumulate in
    DECIMAL so they are exact and order-independent — double sums would
    hash-differ between engines."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dec = lambda c: c.cast("decimal(18,4)")
    out = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec(F.col("l_quantity"))).alias("_sq"),
            F.sum(dec(F.col("l_extendedprice"))).alias("_sp"),
            F.sum(dec(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))))
             .alias("_sd"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return out.select(
        "l_returnflag", "l_linestatus",
        F.col("_sq").cast("double").alias("sum_qty"),
        F.col("_sp").cast("double").alias("sum_base_price"),
        F.col("_sd").cast("double").alias("sum_disc_price"),
        F.round(F.col("_sq").cast("double") / F.col("count_order"), 4).alias("avg_qty"),
        "count_order",
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_disc_price,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4)
         AS avg_qty,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# raster <-> vector overlay (north_rule capability; center-sampling rule)
# ---------------------------------------------------------------------------

RASTER_RES = 16
_PWX = WX / RASTER_RES   # exact binary: 78.125/16
_PWY = WY / RASTER_RES   # exact binary: 97.65625/16
_DIAMOND_SQL = (
    f"ABS(cx - {DIAMOND_CX}) / {DIAMOND_A} + "
    f"ABS(cy - {DIAMOND_CY}) / {DIAMOND_B} < 1.0"
)


def _diamond_np():
    import numpy as np

    return np.asarray(DIAMOND_POLY, dtype=np.float64)


def q_raster_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster: per-tile extent-mask coverage (res x res center-sampling
    rasterization of the clip polygon over the tile grid).  The engine
    runs the vectorized even-odd kernel; the oracle recomputes every
    pixel center against the diamond closed form."""
    from ..operators.raster import mask_coverage, rasterize_extent

    masks = rasterize_extent(_grid_index(), _diamond_np(), res=RASTER_RES)
    mdf = spark.createDataFrame(masks, schema="tile_gid bigint, pix_id bigint")
    return mask_coverage(mdf, res=RASTER_RES)


SQL_RASTER_MASK = f"""
WITH cells AS (
  SELECT (r * {GRID_N} + c + 1) AS tile_gid,
         {T.xmin} + c * {WX} + (pc + 0.5) * {_PWX} AS cx,
         {T.ymin} + r * {WY} + (pr + 0.5) * {_PWY} AS cy
  FROM (SELECT UNNEST(RANGE({GRID_N})) AS c), (SELECT UNNEST(RANGE({GRID_N})) AS r),
       (SELECT UNNEST(RANGE({RASTER_RES})) AS pc), (SELECT UNNEST(RANGE({RASTER_RES})) AS pr)
)
SELECT tile_gid, CAST(COUNT(*) AS BIGINT) AS pix_inside,
       ROUND(COUNT(*) / {float(RASTER_RES * RASTER_RES)}, 6) AS coverage
FROM cells
WHERE {_DIAMOND_SQL}
GROUP BY tile_gid
"""


def q_raster_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster<->vector overlay: features survive iff their pixel is in
    the extent mask (broadcast semi-join on (tile_gid, pix_id) — the
    fact table never shuffles)."""
    from ..operators.raster import overlay_extent_mask, rasterize_extent

    idx = _grid_index()
    masks = spark.createDataFrame(
        rasterize_extent(idx, _diamond_np(), res=RASTER_RES),
        schema="tile_gid bigint, pix_id bigint",
    )
    kept = overlay_extent_mask(_assigned(spark, sf_dir), masks, idx.grid,
                               res=RASTER_RES)
    return kept.groupBy("tile_gid", "tile_unit").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


SQL_RASTER_OVERLAY = f"""
SELECT tile_gid, tile_unit, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM (
  SELECT tile_gid, tile_unit,
         {T.xmin} + tile_col * {WX}
           + (GREATEST(LEAST(CAST(FLOOR((x - ({T.xmin} + tile_col * {WX})) / {_PWX}) AS BIGINT),
                             {RASTER_RES - 1}), 0) + 0.5) * {_PWX} AS cx,
         {T.ymin} + tile_row * {WY}
           + (GREATEST(LEAST(CAST(FLOOR((y - ({T.ymin} + tile_row * {WY})) / {_PWY}) AS BIGINT),
                             {RASTER_RES - 1}), 0) + 0.5) * {_PWY} AS cy
  FROM ({TILE_SQL})
)
WHERE {_DIAMOND_SQL}
GROUP BY tile_gid, tile_unit
"""


# ---------------------------------------------------------------------------
# bag3d result assembly (S7 CSV ingest + J6 file-date stamp + J4 full
# assembly + P5 validity filter + S8 CSV export; operators/bag3d.py)
# ---------------------------------------------------------------------------

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
_ASSET_BASE_DATE = "2024-06-01 00:00:00"


def _bag3d_assembled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared assembly pipeline: per-tile heights go through a REAL
    worker-CSV round-trip (S6 write -> S7 schema-explicit read), get
    their point-cloud file_date stamped by a broadcast join against the
    asset index (J6: footprint tile (row,col) -> covering 2x2 asset
    tile), and join back onto every footprint column (J4 at the
    reference's full-table fidelity, bag3d.py:143-176).  Every derived
    attribute is a closed form of doc_id so the DuckDB oracle recomputes
    the whole thing without touching the CSVs."""
    import os

    import pandas as pd

    from ..operators.bag3d import (
        assemble_bag3d,
        load_worker_csvs,
        stamp_file_date,
        write_worker_csvs,
    )
    from ..operators.heights import percentile_heights

    assigned = _assigned(spark, sf_dir)
    heights = percentile_heights(assigned, key="tile_gid", value="n_chars")
    # one stable dir per sf_dir, mode=overwrite: repeated invocations
    # (bench min-of-2, oracle checks) reuse it instead of leaving an
    # unbounded trail of mkdtemp trees in /tmp; digest-keyed so the
    # reuse holds ACROSS driver processes too
    from ..scratch import scratch_dir

    csv_dir = scratch_dir("b3d_worker_csvs", os.path.abspath(sf_dir))
    write_worker_csvs(heights, csv_dir)
    loaded = load_worker_csvs(spark, csv_dir).withColumn(
        "tile_gid", F.col("tile_gid").cast("bigint")
    )
    # footprint tile (row, col) -> covering asset tile of the 2x2 grid
    row = (F.col("tile_gid") - 1) / F.lit(GRID_N)
    col = (F.col("tile_gid") - 1) % F.lit(GRID_N)
    arow = F.floor(F.floor(row) / F.lit(GRID_N // ASSET_N))
    acol = F.floor(col / F.lit(GRID_N // ASSET_N))
    loaded = loaded.withColumn(
        "asset_gid", (arow * F.lit(ASSET_N) + acol + 1).cast("bigint")
    )
    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_gid": pd.array(range(1, ASSET_N * ASSET_N + 1), dtype="int64"),
                "file_date": [
                    pd.Timestamp(_ASSET_BASE_DATE) + pd.Timedelta(days=g)
                    for g in range(1, ASSET_N * ASSET_N + 1)
                ],
            }
        )
    )
    stamped = stamp_file_date(loaded, assets)
    feats = assigned.withColumn(
        "bouwjaar", (F.lit(1950) + F.col("doc_id") % 100).cast("int")
    ).withColumn(
        "begin_ts",
        F.expr(
            "timestampadd(DAY, CAST(doc_id % 9000 AS INT),"
            " TIMESTAMP '2000-01-01 00:00:00')"
        ),
    )
    return assemble_bag3d(
        feats.select(
            "doc_id", "lang", "source", "n_chars", "tile_gid", "tile_unit",
            "bouwjaar", "begin_ts",
        ),
        stamped.drop("asset_gid"),
        key="tile_gid",
    )


_BAG3D_PCTS = [
    f"ground_{p:02d}" for p in (0, 10, 20, 30, 40, 50)
] + [f"roof_{p:02d}" for p in (0, 10, 25, 50, 75, 90, 95, 99)]


def _bag3d_select(df: DataFrame) -> DataFrame:
    return df.select(
        "doc_id", "lang", "source", "n_chars", "tile_gid", "tile_unit",
        "bouwjaar",
        F.date_format("begin_ts", _TS_FMT_SPARK).alias("begin_ts"),
        F.date_format("ahn_file_date", _TS_FMT_SPARK).alias("ahn_file_date"),
        *_BAG3D_PCTS,
        "n_rows",
    )


def q_bag3d_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's bag3d console pipeline end-to-end (S7+J6+J4):
    worker CSVs -> file-date stamp -> full footprints ⋈ heights table."""
    return _bag3d_select(_bag3d_assembled(spark, sf_dir))


def q_bag3d_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: the bag3d_valid_height rule over the assembled table
    (bouwjaar <= year(ahn_file_date) AND begin < ahn_file_date,
    reference bag3d.py:188-194)."""
    from ..operators.bag3d import valid_height_filter

    return _bag3d_select(valid_height_filter(_bag3d_assembled(spark, sf_dir)))


def _sql_bag3d(valid_only: bool) -> str:
    pct_cols = _pct_sql_cols()
    where = (
        "WHERE bouwjaar <= DATE_PART('year', ahn_ts) AND begin_raw < ahn_ts"
        if valid_only
        else ""
    )
    return f"""
WITH assigned AS ({TILE_SQL}),
heights AS (
  SELECT tile_gid,
         {pct_cols},
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM assigned GROUP BY tile_gid
), stamped AS (
  SELECT *,
         TIMESTAMP '{_ASSET_BASE_DATE}' + INTERVAL (
           ((tile_gid - 1) // {GRID_N} // {GRID_N // ASSET_N}) * {ASSET_N}
           + ((tile_gid - 1) % {GRID_N}) // {GRID_N // ASSET_N} + 1
         ) DAY AS ahn_ts
  FROM heights
), full_tbl AS (
  SELECT a.doc_id, a.lang, a.source, a.n_chars, a.tile_gid, a.tile_unit,
         CAST(1950 + a.doc_id % 100 AS INT) AS bouwjaar,
         TIMESTAMP '2000-01-01 00:00:00'
           + INTERVAL (a.doc_id % 9000) DAY AS begin_raw,
         s.* EXCLUDE (tile_gid)
  FROM assigned a JOIN stamped s USING (tile_gid)
)
SELECT doc_id, lang, source, n_chars, tile_gid, tile_unit, bouwjaar,
       STRFTIME(begin_raw, '{_TS_FMT_DUCK}') AS begin_ts,
       STRFTIME(ahn_ts, '{_TS_FMT_DUCK}') AS ahn_file_date,
       {", ".join(_BAG3D_PCTS)},
       n_rows
FROM full_tbl
{where}
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "tile_assign": (q_tile_assign, SQL_TILE_ASSIGN),
    "tile_assign_buffered": (q_tile_assign_buffered, SQL_TILE_ASSIGN_BUFFERED),
    "tile_counts": (q_tile_counts, SQL_TILE_COUNTS),
    "tile_select": (q_tile_select, SQL_TILE_SELECT),
    "extent_filter": (q_extent_filter, SQL_EXTENT_FILTER),
    "neighbor_pairs": (q_neighbor_pairs, SQL_NEIGHBOR_PAIRS),
    "knn_tiles": (q_knn_tiles, SQL_KNN_TILES),
    "knn_tiles_ring": (q_knn_tiles_ring, SQL_KNN_TILES_RING),
    "percentile_heights": (q_percentile_heights, SQL_PERCENTILE_HEIGHTS),
    "heights_join": (q_heights_join, SQL_HEIGHTS_JOIN),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "line_dedup": (q_line_dedup, SQL_LINE_DEDUP),
    "dedup_ngram": (q_dedup_ngram, SQL_DEDUP_NGRAM),
    "dedup_embedding": (q_dedup_embedding, SQL_DEDUP_EMBEDDING),
    "dedup_minhash": (q_dedup_minhash, None),  # sql built lazily below
    "dedup_simhash": (q_dedup_simhash, None),  # sql built lazily below
    "dedup_clusters": (q_dedup_clusters, None),  # sql built lazily below
    "ann_lsh": (q_ann_lsh, None),  # sql built lazily below
    "cell_encode": (q_cell_encode, SQL_CELL_ENCODE),
    "multimodal_meta": (q_multimodal_meta, SQL_MULTIMODAL_META),
    "frame_sample": (q_frame_sample, SQL_FRAME_SAMPLE),
    "textstats": (q_textstats, None),  # sql built lazily below
    "ann_cosine": (q_ann_cosine, SQL_ANN_COSINE),
    "ann_ivf": (q_ann_ivf, None),  # sql built lazily below
    "repetition": (q_repetition, SQL_REPETITION),
    "sample_hash": (q_sample_hash, SQL_SAMPLE_HASH),
    "sample_stratified": (q_sample_stratified, SQL_SAMPLE_STRATIFIED),
    "sample_mixture": (q_sample_mixture, SQL_SAMPLE_MIXTURE),
    "domain_cap": (q_domain_cap, SQL_DOMAIN_CAP),
    "scrub_pii": (q_scrub_pii, None),  # sql built lazily below
    "url_dedup": (q_url_dedup, None),  # sql built lazily below
    "pack_sequences": (q_pack_sequences, None),  # sql built lazily below
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "events_window": (q_events_window, SQL_EVENTS_WINDOW),
    "events_window_stream": (q_events_window_stream, SQL_EVENTS_WINDOW),
    "user_totals_stream": (q_user_totals_stream, SQL_USER_TOTALS_STREAM),
    "events_dedup_stream": (q_events_dedup_stream, SQL_EVENTS_DEDUP_STREAM),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "top_events": (q_top_events, SQL_TOP_EVENTS),
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "raster_mask": (q_raster_mask, SQL_RASTER_MASK),
    "raster_overlay": (q_raster_overlay, SQL_RASTER_OVERLAY),
    "bag3d_assembly": (q_bag3d_assembly, _sql_bag3d(valid_only=False)),
    "bag3d_valid": (q_bag3d_valid, _sql_bag3d(valid_only=True)),
}
REGISTRY["textstats"] = (q_textstats, _sql_textstats())


def _sql_scrub_pii_q() -> str:
    from ..operators.textstats import sql_scrub_pii

    return sql_scrub_pii(from_sql=f"({_sql_pii_injected()})")


REGISTRY["scrub_pii"] = (q_scrub_pii, _sql_scrub_pii_q())
REGISTRY["url_dedup"] = (q_url_dedup, _sql_url_dedup())
REGISTRY["pack_sequences"] = (q_pack_sequences, _sql_pack_sequences())
REGISTRY["dup_spans"] = (q_dup_spans, _sql_dup_spans())
REGISTRY["asof_join"] = (q_asof_join, _sql_asof_join())
REGISTRY["pack_emit"] = (q_pack_emit, _sql_pack_emit())
REGISTRY["dedup_incremental"] = (q_dedup_incremental, _sql_dedup_incremental())
REGISTRY["vocab_topk"] = (q_vocab_topk, _sql_vocab_topk())
REGISTRY["cluster_survivors"] = (q_cluster_survivors, _sql_cluster_survivors())
REGISTRY["ann_lsh"] = (q_ann_lsh, _sql_ann_lsh())
REGISTRY["ann_ivf"] = (q_ann_ivf, _sql_ann_ivf())
REGISTRY["dedup_minhash"] = (q_dedup_minhash, _sql_dedup_minhash())
REGISTRY["dedup_simhash"] = (q_dedup_simhash, _sql_dedup_simhash())
REGISTRY["dedup_clusters"] = (q_dedup_clusters, _sql_dedup_clusters())


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by integer-quantized tf-idf
    (operators/tfidf.tfidf_topk): corpus df via partial-aggregating
    groupBys (hot tokens combine map-side), scalar doc count as a
    broadcast cross join, per-doc rank window bounded by doc length.
    Scores are integers (tf * ((1e6*N) div df)) so the DuckDB twin is
    bit-exact with no float log anywhere."""
    from ..operators.tfidf import tfidf_topk

    return tfidf_topk(_docs(spark, sf_dir), k=3)


def _sql_tfidf_topk() -> str:
    from ..operators.tfidf import sql_tfidf_topk

    return sql_tfidf_topk(k=3)


def q_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-commonness quality proxy (operators/tfidf.
    commonness_score — the CCNet-LM-filter stand-in): corpus unigram
    frequencies (map-side-combined groupBy), occurrences joined back on
    the token (a skewed-join key AQE can split, unlike a window), mean
    ppm per doc with a single final IEEE division."""
    from ..operators.tfidf import commonness_score

    return commonness_score(_docs(spark, sf_dir))


def _sql_commonness() -> str:
    from ..operators.tfidf import sql_commonness_score

    return sql_commonness_score()


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus composition report (operators/textstats.
    corpus_stats): one partial-aggregating groupBy over tiny stratum
    cardinality — the mixture-design table every pipeline reads
    first.  Exact integer counts/sums, one final IEEE division."""
    from ..operators.textstats import corpus_stats

    return corpus_stats(_docs(spark, sf_dir))


def _sql_corpus_stats() -> str:
    from ..operators.textstats import sql_corpus_stats

    return sql_corpus_stats()


def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-chunk layout (operators/packing.chunk_docs): 64-token
    windows every 48 tokens per document — MAP-ONLY (token count +
    sequence explode + integer arithmetic; zero shuffles, zero Python),
    the embedding/finetune-prep counterpart of pack_sequences."""
    from ..operators.packing import chunk_docs

    return chunk_docs(_docs(spark, sf_dir), n_ctx=64, stride=48)


def _sql_chunk_docs() -> str:
    from ..operators.packing import sql_chunk_docs

    return sql_chunk_docs(n_ctx=64, stride=48)


REGISTRY["tfidf_topk"] = (q_tfidf_topk, _sql_tfidf_topk())
REGISTRY["commonness"] = (q_commonness, _sql_commonness())
REGISTRY["corpus_stats"] = (q_corpus_stats, _sql_corpus_stats())
REGISTRY["chunk_docs"] = (q_chunk_docs, _sql_chunk_docs())


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level exact paragraph dedup, keep-first policy
    (operators/dedup.paragraph_dedup): blank-line blocks of >= 30
    chars may appear once across the corpus; the lowest (doc_id,
    par_no) occurrence survives and documents are reassembled.  Same
    two-shuffle groupBy-min shape as line_dedup — no window over the
    paragraph value, hot boilerplate absorbs map-side."""
    from ..operators.dedup import paragraph_dedup

    return paragraph_dedup(_docs(spark, sf_dir), mode="keep_first")


def q_paragraph_dedup_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph dedup, drop-all policy (the CCNet rule): every
    occurrence of a corpus-repeated paragraph is deleted — repeated
    boilerplate carries no training signal even once.  Identical
    shuffle shape to keep_first; only the post-aggregation filter
    (count == 1) differs."""
    from ..operators.dedup import paragraph_dedup

    return paragraph_dedup(_docs(spark, sf_dir), mode="drop_all")


_SQL_PARAGRAPH_COMMON = """
WITH p AS (
  SELECT doc_id, UNNEST([{'par_no': i, 'par': arr[i]}
                         FOR i IN RANGE(1, LEN(arr) + 1)],
                        recursive := true)
  FROM (SELECT doc_id,
               string_split(COALESCE(text, ''), chr(10) || chr(10)) AS arr
        FROM documents)
), kept AS (
  SELECT doc_id, par_no, par FROM p WHERE LENGTH(par) < 30
  UNION ALL
  {long_rule}
), reb AS (
  SELECT doc_id,
         STRING_AGG(par, chr(10) || chr(10) ORDER BY par_no) AS text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(reb.text, '') AS text
FROM documents d LEFT JOIN reb ON reb.doc_id = d.doc_id
"""

# str.replace, not str.format: the template's UNNEST struct literal
# uses braces that .format would try to interpolate
SQL_PARAGRAPH_DEDUP = _SQL_PARAGRAPH_COMMON.replace("{long_rule}", """
  SELECT doc_id, par_no, par FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY par
                                 ORDER BY doc_id, par_no) AS rn
    FROM p WHERE LENGTH(par) >= 30
  ) WHERE rn = 1
""")

SQL_PARAGRAPH_DEDUP_ALL = _SQL_PARAGRAPH_COMMON.replace("{long_rule}", """
  SELECT doc_id, par_no, par FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY par) AS n
    FROM p WHERE LENGTH(par) >= 30
  ) WHERE n = 1
""")

REGISTRY["paragraph_dedup"] = (q_paragraph_dedup, SQL_PARAGRAPH_DEDUP)
REGISTRY["paragraph_dedup_all"] = (q_paragraph_dedup_all,
                                   SQL_PARAGRAPH_DEDUP_ALL)


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (operators/sampling.
    hash_split): 98/1/1 by sha2-hex-prefix draw on doc_id — a doc's
    split never changes under retries, repartitioning, or corpus
    growth (the eval-leakage guard rand() cannot give).  Map-only JVM
    CASE chain, zero shuffles."""
    from ..operators.sampling import hash_split

    return hash_split(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        key_col="doc_id", seed="sp",
    )


SQL_HASH_SPLIT = f"""
SELECT doc_id, lang,
       CASE WHEN {_sql_hex15("doc_id", "sp")} < 0.98 THEN 'train'
            WHEN {_sql_hex15("doc_id", "sp")} < 0.99 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""

REGISTRY["hash_split"] = (q_hash_split, SQL_HASH_SPLIT)


def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization of the embeddings table
    (operators/similarity.quantize_int8 — the 4x storage/bandwidth cut
    a 100 TB embedding store ships with), emitted in exploded
    (vec_id, pos, qval, scale) form so the value hash covers every
    code byte in order.  MAP-ONLY: one Arrow kernel, zero shuffles.
    Determinism: float64 (x*127.0)/scale in the oracle's op order,
    sign*floor(abs+0.5) half-away rounding (numpy round() is
    half-even and would diverge on exact ties)."""
    from ..operators.similarity import quantize_int8

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qz = quantize_int8(emb)
    return qz.select(
        "vec_id",
        "scale",
        F.posexplode("q").alias("pos", "qval"),
    ).select(
        "vec_id", F.col("pos").cast("int").alias("pos"),
        F.col("qval").cast("int").alias("qval"), "scale",
    )


SQL_QUANTIZE_INT8 = """
WITH b AS (
  SELECT vec_id,
         CAST(embedding AS DOUBLE[]) AS v,
         list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                 x -> abs(x))) AS s
  FROM embeddings
), e AS (
  SELECT vec_id, s, UNNEST([{'pos': i - 1, 'x': v[i]}
                            FOR i IN RANGE(1, LEN(v) + 1)],
                           recursive := true)
  FROM b
)
SELECT vec_id,
       CAST(pos AS INTEGER) AS pos,
       CAST(CASE WHEN s = 0 OR s IS NULL THEN 0
                 WHEN x >= 0 THEN FLOOR(x * 127.0 / s + 0.5)
                 ELSE -FLOOR(ABS(x * 127.0 / s) + 0.5) END
            AS INTEGER) AS qval,
       COALESCE(s, 0.0) AS scale
FROM e
"""

REGISTRY["quantize_int8"] = (q_quantize_int8, SQL_QUANTIZE_INT8)


def _sql_mh_ctes(alias: str, src: str) -> str:
    """CTE chain computing per-doc minhash signatures (mh0..mh63) and
    16 band keys for a derived source `src` — the reusable core of
    _sql_dedup_minhash's byte-level HUGEINT machinery, WITHOUT the
    exact-dup prefilter (the incremental rule hashes every doc).
    Emits `{alias}_mh` (doc_id, mh0..63) and `{alias}_band`
    (doc_id, band_id, band_key)."""
    from ..operators.dedup import MERSENNE, _perm_params, _token_weights

    w = [int(v) for v in _token_weights(5)][::-1]
    sh_terms = " + ".join(
        f"CAST({_sql_byte('hx', f'i + {j}')} AS HUGEINT) * {w[j]}"
        for j in range(5)
    )
    pad_terms = " + ".join(
        f"CAST({_sql_byte('hx', str(j + 1), guard=True)} AS HUGEINT) * {w[j]}"
        for j in range(5)
    )
    a, b = _perm_params(64)
    mh_cols = ",\n         ".join(
        f"LIST_MIN(LIST_TRANSFORM(shingles, s -> (CAST({int(a[i])} AS HUGEINT)"
        f" * (s % {MERSENNE}) + {int(b[i])}) % {MERSENNE})) AS mh{i}"
        for i in range(64)
    )
    band_keys = ", ".join(
        "CAST(mh%d AS VARCHAR) || ',' || CAST(mh%d AS VARCHAR) || ',' || "
        "CAST(mh%d AS VARCHAR) || ',' || CAST(mh%d AS VARCHAR)"
        % (4 * bb, 4 * bb + 1, 4 * bb + 2, 4 * bb + 3)
        for bb in range(16)
    )
    return f"""
{alias}_raw AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
  FROM {src}
), {alias}_sh AS (
  SELECT doc_id,
         LIST_DISTINCT(CASE WHEN nb >= 5 THEN
           [({sh_terms}) % 18446744073709551616
            FOR i IN RANGE(1, nb - 3)]
         ELSE [({pad_terms}) % 18446744073709551616] END) AS shingles
  FROM {alias}_raw
), {alias}_mh AS (
  SELECT doc_id,
         {mh_cols}
  FROM {alias}_sh
), {alias}_band AS (
  SELECT doc_id, UNNEST(RANGE(16)) AS band_id,
         UNNEST([{band_keys}]) AS band_key
  FROM {alias}_mh
)"""


_NINC_DERIVED = """
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN printf('boilerplate %d', doc_id % 70)
              ELSE text END AS text
  FROM documents
"""


def q_near_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup admission (operators/incremental.
    register_minhash_corpus + near_dedup_increment): corpus = docs
    with doc_id % 3 != 0 materialized as the two bucketed LSH state
    tables (signatures by id, capped band postings by (band_id,
    band_hash)); batch = the remaining third, with every 5th doc's
    content replaced by shared boilerplate (those are est-jaccard-1
    collisions).  A batch doc is admitted iff its estimated jaccard
    (matching signature components / 64) is < 0.5 against every
    corpus doc and every lower-id batch doc.  Only batch-derived rows
    shuffle; the state side is Exchange-free (merge-hinted bucketed
    joins)."""
    from ..operators.incremental import (
        near_dedup_increment,
        register_minhash_corpus,
    )

    d = F.col("doc_id")
    content = F.when(
        d % 5 == 0, F.format_string("boilerplate %d", F.pmod(d, F.lit(70)))
    ).otherwise(F.col("text"))
    docs = _docs(spark, sf_dir).select("doc_id", content.alias("text"))
    table = "b3d_ninc_contract"
    register_minhash_corpus(
        spark, docs.where(d % 3 != 0), table, n_buckets=8
    )
    return near_dedup_increment(spark, docs.where(d % 3 == 0), table)


def _sql_near_dedup_incremental() -> str:
    est = " + ".join(
        f"CASE WHEN bm.mh{i} = cm.mh{i} THEN 1 ELSE 0 END"
        for i in range(64)
    )
    est_ab = " + ".join(
        f"CASE WHEN ma.mh{i} = mb.mh{i} THEN 1 ELSE 0 END"
        for i in range(64)
    )
    return f"""
WITH batch AS (SELECT * FROM ({_NINC_DERIVED}) WHERE doc_id % 3 = 0),
corpus AS (SELECT * FROM ({_NINC_DERIVED}) WHERE doc_id % 3 <> 0),
{_sql_mh_ctes('b', 'batch')},
{_sql_mh_ctes('c', 'corpus')},
cband_capped AS (
  SELECT doc_id, band_id, band_key FROM c_band
  QUALIFY ROW_NUMBER() OVER (PARTITION BY band_id, band_key
                             ORDER BY doc_id) <= 128
), hits AS (
  SELECT DISTINCT bb.doc_id AS bid, cc.doc_id AS cid
  FROM b_band bb JOIN cband_capped cc USING (band_id, band_key)
), cdup AS (
  SELECT DISTINCT bid AS doc_id FROM hits
  JOIN b_mh bm ON bm.doc_id = hits.bid
  JOIN c_mh cm ON cm.doc_id = hits.cid
  WHERE ({est}) >= 32
), bband_capped AS (
  SELECT doc_id, band_id, band_key FROM b_band
  QUALIFY ROW_NUMBER() OVER (PARTITION BY band_id, band_key
                             ORDER BY doc_id) <= 128
), bpairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bband_capped a JOIN bband_capped b USING (band_id, band_key)
  WHERE a.doc_id < b.doc_id
), idup AS (
  SELECT DISTINCT id_b AS doc_id FROM bpairs
  JOIN b_mh ma ON ma.doc_id = bpairs.id_a
  JOIN b_mh mb ON mb.doc_id = bpairs.id_b
  WHERE ({est_ab}) >= 32
)
SELECT b.doc_id, b.text FROM batch b
WHERE b.doc_id NOT IN (SELECT doc_id FROM cdup)
  AND b.doc_id NOT IN (SELECT doc_id FROM idup)
"""


REGISTRY["near_dedup_incremental"] = (q_near_dedup_incremental,
                                      _sql_near_dedup_incremental())


# engine-shared injection SQL (runs verbatim under Spark selectExpr AND
# DuckDB): turns the single-line fixture docs into 5..7-line pages with
# a deterministic mix of C4 keeps and drops — terminal punctuation only
# on even doc_ids' first line, a too-short line, a 'javascript' line, a
# no-punctuation multibyte dash line, plus page-level 'lorem ipsum'
# (doc_id%17) and '{' (doc_id%19) poison pages
_C4_INJECT = (
    "substr(text, 1, 60) || CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END"
    " || chr(10) || 'Buy now'"
    " || chr(10) || 'Enable javascript to view ' || substr(text, 1, 20) || '.'"
    " || chr(10) || substr(text, 11, 50) || ' end of line two.'"
    " || chr(10) || CASE WHEN doc_id % 3 <> 1"
    "               THEN substr(text, 6, 45) || ' tail line three.'"
    "               ELSE '—' END"
    " || CASE WHEN doc_id % 17 = 0"
    "    THEN chr(10) || 'Lorem Ipsum dolor sit amet consectetur adipiscing.'"
    "    ELSE '' END"
    " || CASE WHEN doc_id % 19 = 0"
    "    THEN chr(10) || 'config { nested } block noted here.'"
    "    ELSE '' END"
)


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level page cleaning (operators/textstats.c4_line_filter,
    Raffel et al. 2020 section 2.2): the fixture docs are single-line
    with no punctuation, so engine and oracle first derive the SAME
    multi-line pages (the _C4_INJECT expression is shared SQL, run
    verbatim by both), then apply the rules — terminal-punctuation +
    min-words + no-javascript per line, lorem-ipsum / '{' page drops,
    and a minimum surviving-line count.  The value hash covers the
    reassembled page text byte-for-byte."""
    from ..operators.textstats import c4_line_filter

    injected = _docs(spark, sf_dir).selectExpr(
        "doc_id", _C4_INJECT + " AS text"
    )
    return c4_line_filter(injected, min_words=5, min_lines=2)


def _sql_c4_clean() -> str:
    from ..operators.textstats import sql_c4_line_filter

    inj = (f"(SELECT doc_id, {_C4_INJECT} AS text FROM documents)"
           " AS injected")
    return sql_c4_line_filter(min_words=5, min_lines=2, table=inj)


REGISTRY["c4_clean"] = (q_c4_clean, _sql_c4_clean())


def q_winnow_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (operators/winnow.winnow_fingerprints,
    Schleimer et al. SIGMOD'03): word-4-gram polynomial hashes, window
    of 5, rightmost-minimum selection.  Map-only — the extraction
    itself has no shuffle; the oracle recomputes token hashes
    (byte-level, hex(encode())), gram hashes (HUGEINT split-multiply
    mod 2^64) and the window selection exactly."""
    from ..operators.winnow import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf_dir), n=4, w=5)


def _sql_mul64(e: str, q: int) -> str:
    """HUGEINT-safe `({e}) * {q} mod 2^64` for e < 2^64: split q into
    32-bit halves so no intermediate exceeds 2^97 (HUGEINT holds
    2^127).  (a*qhi*2^32) mod 2^64 == ((a*qhi) mod 2^32)*2^32; the
    caller applies the final % 2^64 after summing terms (mod is
    additive, so per-term reduction is unnecessary)."""
    qhi, qlo = q >> 32, q & 0xFFFFFFFF
    return (f"((({e}) * {qhi}) % 4294967296) * 4294967296"
            f" + ({e}) * {qlo}")


def _sql_winnow_sel(n: int, w: int, table: str = "documents") -> str:
    """Shared winnowing CTE chain ending in `sel` = (doc_id, t, pos,
    mh): per-window rightmost-minimum gram selections.  Token hashes
    are the simhash byte-level construction; gram hashes combine them
    with golden-gamma powers via _sql_mul64; zero-padding past the
    last token mirrors the engine's short-doc rule."""
    from ..operators.dedup import _TOKEN_MAX_BYTES, _token_weights
    from ..operators.winnow import _gram_weights

    tw = [int(v) for v in _token_weights(_TOKEN_MAX_BYTES)]
    tok_terms = " + ".join(
        f"CAST({_sql_byte('h', str(j + 1), guard=True)} AS HUGEINT) * {tw[j]}"
        for j in range(_TOKEN_MAX_BYTES)
    )
    gw = [int(v) for v in _gram_weights(n)]
    gram_terms = " + ".join(
        f"CASE WHEN pos + {j + 1} <= m"
        f" THEN {_sql_mul64(f'hs[pos + {j + 1}]', gw[j])} ELSE 0 END"
        for j in range(n)
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN LENGTH(TRIM(COALESCE(text, ''))) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') END AS tk
  FROM {table}
), th AS (
  SELECT doc_id, LEN(tk) AS m,
         LIST_TRANSFORM(LIST_TRANSFORM(tk, t -> hex(encode(t))),
                        h -> ({tok_terms}) % 18446744073709551616) AS hs
  FROM toks WHERE LEN(tk) > 0
), g AS (
  SELECT doc_id, m, GREATEST(m - {n} + 1, 1) AS gcnt, u.i AS pos,
         ({gram_terms}) % 18446744073709551616 AS h
  FROM th, UNNEST(RANGE(0, GREATEST(m - {n} + 1, 1))) AS u(i)
), win AS (
  SELECT doc_id, pos AS t,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW
                      AND {w - 1} FOLLOWING) AS mh
  FROM g
  QUALIFY pos <= GREATEST(gcnt - {w}, 0)
), sel AS (
  SELECT w2.doc_id, w2.t, MAX(g.pos) AS pos, w2.mh
  FROM win w2 JOIN g ON g.doc_id = w2.doc_id
        AND g.pos BETWEEN w2.t AND w2.t + {w - 1} AND g.h = w2.mh
  GROUP BY w2.doc_id, w2.t, w2.mh
)"""


def _sql_winnow_fps() -> str:
    return f"""{_sql_winnow_sel(4, 5)}
SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos,
       CAST(CASE WHEN mh >= 9223372036854775808
                 THEN mh - 18446744073709551616
                 ELSE mh END AS BIGINT) AS fp
FROM sel
"""


REGISTRY["winnow_fps"] = (q_winnow_fps, _sql_winnow_fps())


def q_winnow_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style shared-fingerprint pairs
    (operators/winnow.winnow_dup_pairs): docs sharing >= 2 distinct
    winnowing fingerprints, per-fp buckets capped to the 128 lowest
    ids (QUALIFY-mirrored) before pairing."""
    from ..operators.winnow import winnow_dup_pairs

    return winnow_dup_pairs(
        _docs(spark, sf_dir), n=4, w=5, min_shared=2, bucket_cap=128
    )


def _sql_winnow_dups() -> str:
    return f"""{_sql_winnow_sel(4, 5)}
, fp AS (
  SELECT DISTINCT doc_id, mh FROM sel
), capped AS (
  SELECT doc_id, mh FROM fp
  QUALIFY ROW_NUMBER() OVER (PARTITION BY mh ORDER BY doc_id) <= 128
)
SELECT id_a, id_b, n_shared FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM capped a JOIN capped b ON a.mh = b.mh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
) WHERE n_shared >= 2
"""


REGISTRY["winnow_dups"] = (q_winnow_dups, _sql_winnow_dups())


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-BM25 top-5 retrieval (operators/bm25.bm25_topk): docs
    with doc_id % 97 == 0 play the query set (their full text as a
    set-of-words query); corpus-side stats are restricted to the
    broadcast query vocabulary; selection is the two-level salted
    top-k the module docstring proves equal to a single ranking."""
    from ..operators.bm25 import bm25_topk

    docs = _docs(spark, sf_dir)
    qs = docs.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("qtext")
    )
    return bm25_topk(docs, qs, k=5)


def _sql_bm25_topk() -> str:
    from ..operators.bm25 import sql_bm25_topk

    return sql_bm25_topk(k=5)


REGISTRY["bm25_topk"] = (q_bm25_topk, _sql_bm25_topk())


def q_target_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style target-domain affinity scoring
    (operators/affinity.target_affinity): target slice = the 'en'
    docs; every doc scored by the ppm-difference of its tokens'
    target-vs-raw unigram frequencies, kept iff mean >= 0."""
    from ..operators.affinity import target_affinity

    docs = _docs(spark, sf_dir)
    return target_affinity(docs, F.col("lang") == "en", threshold_q=0)


def _sql_target_affinity() -> str:
    from ..operators.affinity import sql_target_affinity

    return sql_target_affinity("lang = 'en'", threshold_q=0)


REGISTRY["target_affinity"] = (q_target_affinity, _sql_target_affinity())


_PR_HOSTS = 256  # host-graph width for the contract fixture
_PR_ITERS = 4
_PR_FANOUT = 3


def _host_edges(docs: DataFrame) -> DataFrame:
    """Deterministic host link graph over the documents fixture: each
    doc lives on host doc_id % H and links to FANOUT hosts drawn from
    sha2(doc_id:j) (the sketches._hash48 scheme), self-loops dropped —
    the same synthesized-structure discipline as doc_geocode (the
    corpus carries no link column; the operator under test is
    graphrank.pagerank, the fixture just feeds it a skewed graph)."""
    from ..operators.sketches import _hash48

    targets = F.array(*[
        (_hash48(F.concat(F.col("doc_id").cast("string"),
                          F.lit(f":{j}")), "") % _PR_HOSTS)
        for j in range(_PR_FANOUT)
    ])
    return (
        docs.select((F.col("doc_id") % _PR_HOSTS).alias("src"),
                    F.explode(targets).alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )


def q_host_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-quantized PageRank (operators/graphrank.pagerank) over
    the deterministic host graph: 4 iterations, damping 85%, ranks in
    exact ppb both engines reproduce bit-for-bit."""
    from ..operators.graphrank import pagerank

    return pagerank(_host_edges(_docs(spark, sf_dir)), iters=_PR_ITERS)


def _sql_host_rank() -> str:
    from ..operators.graphrank import sql_pagerank
    from ..operators.sketches import _sql_hexint12

    keys = [f"CAST(doc_id AS VARCHAR) || ':{j}'"
            for j in range(_PR_FANOUT)]
    arms = " UNION ALL ".join(
        f"SELECT doc_id % {_PR_HOSTS} AS src, "
        f"{_sql_hexint12(k, '')} % {_PR_HOSTS} AS dst FROM documents"
        for k in keys
    )
    edges = f"SELECT src, dst FROM ({arms}) WHERE src <> dst"
    return sql_pagerank(edges, iters=_PR_ITERS)


REGISTRY["host_rank"] = (q_host_rank, _sql_host_rank())


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-token sketch per source
    (operators/sketches.kmv_distinct): k=64 minimum 48-bit hashes,
    pure-integer estimate, two-level salted selection the oracle
    verifies with a single ROW_NUMBER."""
    from ..operators.sketches import kmv_distinct

    return kmv_distinct(_docs(spark, sf_dir), group_col="source",
                        k=64, seed="kmv")


def _sql_kmv_distinct() -> str:
    from ..operators.sketches import sql_kmv_distinct

    return sql_kmv_distinct(k=64, seed="kmv")


REGISTRY["kmv_distinct"] = (q_kmv_distinct, _sql_kmv_distinct())


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training order
    (operators/sampling.epoch_shuffle): epoch 1, 8 shards at fixture
    scale — every row addressed by (shard, pos), identical on every
    run/engine/partitioning."""
    from ..operators.sampling import epoch_shuffle

    return epoch_shuffle(_docs(spark, sf_dir), epoch=1, n_shards=8,
                         key_col="doc_id", seed="ep")


def _sql_epoch_shuffle() -> str:
    from ..operators.sampling import sql_epoch_shuffle

    return sql_epoch_shuffle(epoch=1, n_shards=8, key_col="doc_id",
                             seed="ep")


REGISTRY["epoch_shuffle"] = (q_epoch_shuffle, _sql_epoch_shuffle())


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted priority sampling
    (operators/sampling.weighted_priority_sample): top-20 docs per
    lang with integer priority h div weight, weight = n_chars (longer
    docs proportionally likelier) — deterministic, two-level salted
    selection the oracle verifies with one QUALIFY."""
    from ..operators.sampling import weighted_priority_sample

    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang", "source", "n_chars")
    return weighted_priority_sample(
        docs, k=20, weight_col="n_chars", group_col="lang",
        key_col="doc_id", seed="wps")


def _sql_weighted_sample() -> str:
    from ..operators.sampling import sql_weighted_priority_sample

    return sql_weighted_priority_sample(
        k=20, weight_expr="n_chars", group_expr="lang",
        key_col="doc_id", seed="wps",
        cols="doc_id, lang, source, n_chars")


REGISTRY["weighted_sample"] = (q_weighted_sample, _sql_weighted_sample())


def q_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped multi-join top-k (J/A/limit coverage beside the
    Q1-shaped pricing_summary): filtered customers BROADCAST into
    orders, the orders⋈lineitem equi-join left to AQE, revenue summed
    in DECIMAL (exact, order-independent — the pricing_summary rule),
    top-10 via orderBy+limit = TakeOrderedAndProject (per-partition
    heaps; never a global sort).  Ties pinned by o_orderkey."""
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    rev = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,4)")
    )
    return (
        orders.join(F.broadcast(cust),
                    orders["o_custkey"] == cust["c_custkey"])
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("_rev"))
        .select(
            "o_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


SQL_SHIP_PRIORITY = """
SELECT o_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

REGISTRY["ship_priority"] = (q_ship_priority, SQL_SHIP_PRIORITY)


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped six-way join (dimension-chain broadcast
    coverage): region→nation pre-joined and broadcast into supplier
    and customer, facts joined on keys AQE can re-plan, the
    local-supplier condition (c_nationkey = s_nationkey) applied as a
    join predicate; revenue in DECIMAL per the pricing_summary rule."""
    sf = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")
    nr = (
        sf("nation").join(
            F.broadcast(sf("region").where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    supp = sf("supplier").join(
        F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    orders = (
        sf("orders")
        .where((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
               & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")))
        .select("o_orderkey", "o_custkey")
    )
    cust = sf("customer").select("c_custkey", "c_nationkey")
    li = sf("lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    rev = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,4)")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, (orders["o_custkey"] == cust["c_custkey"])
              & (cust["c_nationkey"] == supp["s_nationkey"]))
        .groupBy("n_name")
        .agg(rev.alias("_rev"))
        .select("n_name", F.col("_rev").cast("double").alias("revenue"))
    )


SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
"""

REGISTRY["local_supplier_volume"] = (
    q_local_supplier_volume, SQL_LOCAL_SUPPLIER_VOLUME)


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-classifier quality filtering (operators/quality.py):
    exact-BIGINT dot product over integer ppm text features + a
    threshold decision — the inference pass of a CCNet/GPT-3-style
    quality model, one stateless JVM projection, zero shuffles."""
    from ..operators.quality import quality_score

    return quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "quality_q", "quality_kept")


def _sql_quality_score() -> str:
    from ..operators.quality import sql_quality_score

    return sql_quality_score()


REGISTRY["quality_score"] = (q_quality_score, _sql_quality_score())


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (operators/lmscore.py): add-one
    unigram model self-trained on the corpus, per-doc cost in EXACT
    integer bits (LENGTH(BIN(x)) is floor(log2)+1 in both engines —
    no float log anywhere), milli-bits-per-token normalization, and a
    tertile-threshold keep decision.  Train is one partial-aggregated
    groupBy; score is groupBy(doc_id, tok) + an AQE-splittable token
    join — hot tokens never meet a window (house rule)."""
    from ..operators.lmscore import lm_score, lm_train

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return lm_score(docs, lm_train(docs)).select(
        "doc_id", "lm_bits", "lm_mbits_tok", "lm_kept")


def _sql_lm_score() -> str:
    from ..operators.lmscore import sql_lm_score

    return sql_lm_score()


REGISTRY["lm_score"] = (q_lm_score, _sql_lm_score())


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scoring (operators/contamination.py):
    GPT-3-style word-6-gram overlap of every document against a
    deterministic benchmark subset (doc_id % 19 = 0), exact integer
    ppm + flag.  Doc grams are xxhash64 postings (map-only positions,
    distinct keyed by doc_id), the benchmark side is broadcast, and
    the oracle replays gram STRINGS — a hash-green match certifies
    the posting hash collision-free on this corpus, same as
    dup_spans."""
    from ..operators.contamination import contamination

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    bench = docs.where((F.col("doc_id") % 19) == 0)
    return contamination(docs, bench, n=6).select(
        "doc_id", "n_grams", "n_hit", "contam_ppm", "contaminated")


def _sql_contamination() -> str:
    from ..operators.contamination import sql_contamination

    return sql_contamination(
        n=6,
        benchmark_sql="SELECT text FROM documents WHERE doc_id % 19 = 0",
    )


REGISTRY["contamination"] = (q_contamination, _sql_contamination())


def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session-window sessionization (streaming/events.py
    session_windows, run in batch): per-user 30-min-gap sessions via
    F.session_window — Catalyst's session-merge operator instead of
    the gaps-and-islands window pair of `sessionize`.  The oracle
    replays Spark's merge law in microsecond-exact integer arithmetic:
    sessions merge while ts - prev_ts <= gap (touching windows DO
    merge — pinned by test), session end = last ts + gap."""
    from ..streaming.events import session_windows

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_windows(ev)


SQL_EVENTS_SESSION = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts)
            AS session_seq
  FROM marked
)
SELECT user_id,
       STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       STRFTIME(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
         AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM sess GROUP BY user_id, session_seq
"""

REGISTRY["events_session"] = (q_events_session, SQL_EVENTS_SESSION)


def q_events_session_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming twin of events_session: file-source stream
    -> watermark -> F.session_window merge -> AvailableNow drain to a
    memory sink.  Complete-mode output must equal the batch session
    aggregation row-for-row — gated by the same SQL oracle.  (Session
    windows in streaming require a non-window grouping key — user_id —
    and keep one state row per OPEN session per key, evicted by the
    watermark.)"""
    from ..streaming.events import (
        auto_state_partitions, read_event_stream, run_stream_to_df,
        session_windows)

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    return run_stream_to_df(
        session_windows(stream), output_mode="complete",
        state_partitions=auto_state_partitions(
            spark, f"{sf_dir}/events.parquet"),
    )


REGISTRY["events_session_stream"] = (
    q_events_session_stream, SQL_EVENTS_SESSION)


def q_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom membership sketch (operators/sketches.bloom_build/probe):
    build a 4096-bit / 4-hash filter over every document text, then
    probe a half-member half-absent key set — even doc_ids probe their
    own text (always maybe_member: no false negatives), odd doc_ids
    probe synthetic absent keys whose ~6% deterministic false-positive
    rate the oracle must reproduce bit-for-bit (shared 48-bit sha2 bit
    law).  The filter is <= 4096 rows and broadcast; the probe side
    never forms a hot group (counts key on probe_id)."""
    from ..operators.sketches import bloom_build, bloom_probe

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    bloom = bloom_build(docs, key_col="text", m_bits=4096, k=4)
    probes = docs.select(
        F.col("doc_id").alias("probe_id"),
        F.when(F.col("doc_id") % 2 == 0, F.col("text"))
        .otherwise(F.concat(F.lit("absent-"), F.col("doc_id")))
        .alias("key"),
    )
    return bloom_probe(probes, bloom, m_bits=4096, k=4).select(
        "probe_id", "maybe_member")


def _sql_bloom_probe_q() -> str:
    from ..operators.sketches import sql_bloom_probe

    return sql_bloom_probe(
        build_keys_sql="SELECT text AS key FROM documents",
        probes_sql=(
            "SELECT doc_id AS probe_id, "
            "CASE WHEN doc_id % 2 = 0 THEN text "
            "ELSE 'absent-' || CAST(doc_id AS VARCHAR) END AS key "
            "FROM documents"
        ),
        m_bits=4096,
        k=4,
    )


REGISTRY["bloom_probe"] = (q_bloom_probe, _sql_bloom_probe_q())


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL interchange round trip (sources/jsonl.py): export the
    documents table as sharded gzip JSONL (uniform-hash shards,
    write-once into the digest-keyed scratch root) and read it back
    schema-first in PERMISSIVE/quarantine mode.  The value hash covers
    every column of every row, so a green match certifies the full
    encode/escape/decode cycle (unicode, embedded newlines, nulls)
    byte-exact against the parquet original."""
    import os

    from ..scratch import scratch_dir
    from ..sources.jsonl import read_jsonl, write_jsonl

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    out = os.path.join(scratch_dir("jsonl", sf_dir), "documents_jsonl")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        write_jsonl(_docs(spark, sf_dir).select(*cols), out)
    return read_jsonl(spark, out).select(*cols)


SQL_JSONL_ROUNDTRIP = (
    "SELECT doc_id, text, lang, source, n_chars FROM documents"
)

REGISTRY["jsonl_roundtrip"] = (q_jsonl_roundtrip, SQL_JSONL_ROUNDTRIP)


def q_pretok_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenizer counting (textstats.pretok_count): the
    lookahead-free GPT-2 pre-tokenizer law (contractions / letter runs
    / digit runs / symbol runs / whitespace), RE2∩java.regex-identical
    by construction — the sizing law that makes pack_sequences
    tokenizer-faithful via its n_tokens_col hook (round-5 verdict
    missing-#1, closed end-to-end).  One JVM regexp_count beside the
    whitespace count for comparison; zero shuffles."""
    from ..operators.textstats import pretok_count, token_count

    return _docs(spark, sf_dir).select(
        "doc_id",
        pretok_count(F.col("text")).alias("n_pretok"),
        token_count(F.col("text")).cast("long").alias("n_ws"),
    )


def _sql_pretok_count_q() -> str:
    from ..operators.textstats import sql_pretok_count, sql_token_count

    return (f"SELECT doc_id, {sql_pretok_count('text')} AS n_pretok, "
            f"CAST({sql_token_count('text')} AS BIGINT) AS n_ws "
            f"FROM documents")


REGISTRY["pretok_count"] = (q_pretok_count, _sql_pretok_count_q())


def _attrib_out(j: DataFrame) -> DataFrame:
    return j.select(
        "purchase_id",
        "user_id",
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss")
        .alias("purchase_ts"),
        "purchase_value",
        "click_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        "click_value",
    )


def q_events_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval attribution join (streaming/events.attribution_join,
    run in batch): every purchase x ALL same-user clicks in the day
    before it — the all-touch sibling of `asof_join`'s last-touch.
    One symmetric equi-join on user_id with a residual time-range
    predicate (AQE-splittable; never a window)."""
    from ..streaming.events import attribution_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return _attrib_out(attribution_join(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
        lookback_s=86_400,
    ))


SQL_EVENTS_ATTRIB = """
SELECT p.event_id AS purchase_id, p.user_id,
       STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       p.value AS purchase_value,
       c.event_id AS click_id,
       STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       c.value AS click_value
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 86400 SECONDS
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""

REGISTRY["events_attrib"] = (q_events_attrib, SQL_EVENTS_ATTRIB)


def q_events_attrib_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM twin of events_attrib: one file-source stream
    split into purchase and click streams, watermarks on both sides,
    time-interval inner join (the range predicate bounds the state
    store — Spark evicts rows that can no longer match), append-mode
    AvailableNow drain.  Matches emit on arrival, so the drain equals
    the batch join row-for-row — gated by the same SQL oracle."""
    from ..streaming.events import (
        attribution_join, read_event_stream, run_stream_to_df)

    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    j = attribution_join(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
        lookback_s=86_400,
    )
    return _attrib_out(run_stream_to_df(j, output_mode="append"))


REGISTRY["events_attrib_stream"] = (
    q_events_attrib_stream, SQL_EVENTS_ATTRIB)


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (operators/semdedup.semdedup):
    frozen-seed 64-centroid assignment (map-only Arrow matmul vs the
    broadcast centroid matrix), two-level-salted cluster cap, cid-equi
    candidate self-join, quantized-integer cosine verify — a doc is a
    dup iff a lower-id member of its capped cluster scores >= 0.4.
    Every stage is exact-integer arithmetic, so the oracle recomputes
    assignment, cap and cosines bit-identically."""
    from ..operators.semdedup import semdedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semdedup(emb, threshold=0.4, n_centroids=64, cluster_cap=4096)


def _sql_semdedup() -> str:
    n_centroids, cap, thr = 64, 4096, 0.4
    return f"""
WITH e AS (
  SELECT vec_id,
         LIST_TRANSFORM(CAST(embedding AS DOUBLE[]),
                        x -> ROUND(x * 1048576.0)) AS qv
  FROM embeddings
), c AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cv
  FROM (SELECT vec_id, qv FROM e ORDER BY vec_id LIMIT {n_centroids})
), asg AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY -2 * LIST_DOT_PRODUCT(e.qv, c.cv)
                      + LIST_DOT_PRODUCT(c.cv, c.cv), c.cid) AS rn
    FROM e, c)
  WHERE rn = 1
), capped AS (
  SELECT vec_id, cid FROM asg
  QUALIFY ROW_NUMBER() OVER (PARTITION BY cid ORDER BY vec_id) <= {cap}
), n AS (
  SELECT vec_id, qv, SQRT(LIST_DOT_PRODUCT(qv, qv)) AS nrm FROM e
), dup AS (
  SELECT DISTINCT b.vec_id
  FROM capped a JOIN capped b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN n na ON na.vec_id = a.vec_id
  JOIN n nb ON nb.vec_id = b.vec_id
  WHERE LIST_DOT_PRODUCT(na.qv, nb.qv) / (na.nrm * nb.nrm) >= {thr}
)
SELECT asg.vec_id, CAST(asg.cid AS INT) AS cid,
       (dup.vec_id IS NOT NULL) AS is_dup
FROM asg LEFT JOIN dup ON dup.vec_id = asg.vec_id
"""


REGISTRY["semdedup"] = (q_semdedup, _sql_semdedup())


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid sparse+dense retrieval fused by reciprocal-rank fusion
    (operators/retrieval.rrf_fuse): docs with doc_id % 97 == 0 are the
    queries; their text drives quantized-BM25 top-20 and their aligned
    embedding drives exact-cosine top-20; the two lists full-outer
    join on (query_id, cand_id) and fuse with integer
    floor(1e6 / (60 + rank)) contributions, top-5 per query.  The fuse
    never touches the corpus — O(queries x k) rows a side."""
    from ..operators.bm25 import bm25_topk
    from ..operators.retrieval import rrf_fuse
    from ..operators.similarity import cosine_topk

    docs = _docs(spark, sf_dir)
    qs = docs.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("qtext")
    )
    bm = bm25_topk(docs, qs, k=20).withColumnRenamed("doc_id", "cand_id")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ann = cosine_topk(emb, emb.where(F.col("vec_id") % 97 == 0), k=20)
    return rrf_fuse(bm, ann, k=5)


def _sql_hybrid_rrf() -> str:
    from ..operators.bm25 import sql_bm25_topk

    bm_sql = sql_bm25_topk(
        k=20,
        queries_sql="SELECT doc_id AS query_id, text AS qtext"
                    " FROM documents WHERE doc_id % 97 = 0",
    )
    return f"""
WITH bm AS (
  SELECT query_id, doc_id AS cand_id, rank FROM ({bm_sql})
), q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 97 = 0
), cnd AS (
  SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
), s AS (
  SELECT query_id, cand_id,
         ROUND(LIST_DOT_PRODUCT(qv, cv)
               / (SQRT(LIST_DOT_PRODUCT(qv, qv))
                  * SQRT(LIST_DOT_PRODUCT(cv, cv))), 6) AS cosine
  FROM cnd, q WHERE cand_id <> query_id
), ann AS (
  SELECT query_id, cand_id, rk AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, cand_id) AS rk
    FROM s)
  WHERE rk <= 20
), fa AS (
  SELECT query_id, cand_id,
         CAST(1000000 // (60 + rank) AS BIGINT) AS c FROM bm
), fb AS (
  SELECT query_id, cand_id,
         CAST(1000000 // (60 + rank) AS BIGINT) AS c FROM ann
), fused AS (
  SELECT query_id, cand_id,
         CAST(COALESCE(fa.c, 0) + COALESCE(fb.c, 0) AS BIGINT) AS rrf_q
  FROM fa FULL JOIN fb USING (query_id, cand_id)
)
SELECT query_id, cand_id, rrf_q, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rrf_q DESC, cand_id ASC) AS rank
  FROM fused)
WHERE rank <= 5
"""


REGISTRY["hybrid_rrf"] = (q_hybrid_rrf, _sql_hybrid_rrf())


def q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style URL blocklist filtering
    (operators/urltools.url_blocklist_filter): the fixture has no url
    column, so engine and oracle derive the same deterministic URL per
    doc (case-mixed host, doc_id%50 sites, .com/.org TLD split, a
    /Casino path segment for doc_id%13).  Blocklist = two exact sites
    plus the example.org REGISTERED DOMAIN (suffix semantics: every
    subdomain blocks too, via the suffix-explode equi-join); fragment
    rule = 'casino' anywhere in the lowercased URL.  reason = host >
    fragment > NULL."""
    from ..operators.urltools import url_blocklist_filter

    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("http://SITE")).otherwise(
            F.lit("http://site")
        ),
        F.pmod(d, F.lit(50)).cast("string"),
        F.when(d % 11 == 0, F.lit(".Example.ORG")).otherwise(
            F.lit(".example.com")
        ),
        F.when(d % 13 == 0, F.lit("/Casino")).otherwise(F.lit("")),
        F.format_string("/page%d", F.pmod(d, F.lit(20))),
    )
    urls = _docs(spark, sf_dir).select("doc_id", url.alias("url"))
    bl = spark.createDataFrame(
        [("site7.example.com",), ("site13.example.com",),
         ("example.org",)],
        "blocked string",
    )
    return url_blocklist_filter(urls, bl, blocked_fragments=["casino"])


SQL_URL_FILTER = """
WITH u AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'http://SITE'
               ELSE 'http://site' END)
         || CAST(doc_id % 50 AS VARCHAR)
         || (CASE WHEN doc_id % 11 = 0 THEN '.Example.ORG'
                  ELSE '.example.com' END)
         || (CASE WHEN doc_id % 13 = 0 THEN '/Casino' ELSE '' END)
         || '/page' || CAST(doc_id % 20 AS VARCHAR) AS url
  FROM documents
), h AS (
  SELECT doc_id, url,
         LOWER(REGEXP_EXTRACT(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)) AS host
  FROM u
), s AS (
  SELECT doc_id, url, host,
         LEN(LIST_INTERSECT(
           [ARRAY_TO_STRING(labels[i:LEN(labels)], '.')
            FOR i IN RANGE(1, LEN(labels) + 1)],
           ['site7.example.com', 'site13.example.com', 'example.org']
         )) > 0 AS host_hit
  FROM (SELECT doc_id, url, host,
               STRING_SPLIT(host, '.') AS labels FROM h)
)
SELECT doc_id, host,
       CASE WHEN host_hit THEN 'host'
            WHEN CONTAINS(LOWER(url), 'casino') THEN 'fragment'
       END AS reason
FROM s
"""


REGISTRY["url_filter"] = (q_url_filter, SQL_URL_FILTER)


def _enrich_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer x nation dimension snapshot for event enrichment."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    return (
        cust.join(F.broadcast(nat),
                  cust["c_nationkey"] == nat["n_nationkey"])
        .select("c_custkey", "c_mktsegment", "n_name")
    )


def _enrich_out(df: DataFrame) -> DataFrame:
    return df.select(
        "event_id", "user_id", "event_type", "value",
        "c_mktsegment", "n_name",
    )


def q_events_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join
    (streaming/events.enrich_events): events x broadcast
    customer->nation dimension chain on user_id."""
    from ..streaming.events import enrich_events

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = _enrich_dim(spark, sf_dir)
    return _enrich_out(
        enrich_events(ev, dim, ev["user_id"] == dim["c_custkey"])
    )


SQL_EVENTS_ENRICH = """
SELECT event_id, user_id, event_type, value, c_mktsegment, n_name
FROM events
JOIN customer ON c_custkey = user_id
JOIN nation ON n_nationkey = c_nationkey
"""

REGISTRY["events_enrich"] = (q_events_enrich, SQL_EVENTS_ENRICH)


def q_events_enrich_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin: the SAME enrichment expression over a
    file-source stream — stream-static joins are STATELESS (the
    broadcast dimension is a snapshot each micro-batch plans against),
    so the append-mode AvailableNow drain equals the batch join
    row-for-row and shares its SQL oracle."""
    from ..streaming.events import (
        enrich_events, read_event_stream, run_stream_to_df)

    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    dim = _enrich_dim(spark, sf_dir)
    joined = enrich_events(ev, dim, ev["user_id"] == dim["c_custkey"])
    return _enrich_out(run_stream_to_df(joined, output_mode="append"))


REGISTRY["events_enrich_stream"] = (q_events_enrich_stream,
                                    SQL_EVENTS_ENRICH)


def q_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-order query (the HAVING-on-the-fact
    shape beside Q1/Q3/Q5): groupBy the FACT table on l_orderkey
    (high-cardinality partial agg — no hot key possible, every group
    is one order), HAVING sum(qty) > threshold, then join the small
    surviving set back to orders and customers (AQE sees a shrunken
    build side), top-100 via orderBy+limit = TakeOrderedAndProject.
    Quantities are integral doubles; the sum runs in DECIMAL (exact,
    order-independent) per the pricing_summary rule."""
    qty_thr = 250
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
             .alias("_sum_qty"))
        .where(F.col("_sum_qty") > qty_thr)
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust),
              orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd")
            .alias("o_orderdate"),
            "o_totalprice",
            F.col("_sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


SQL_BIG_SPENDERS = """
SELECT c_name, c_custkey, o_orderkey,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
) big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""

REGISTRY["big_spenders"] = (q_big_spenders, SQL_BIG_SPENDERS)


def q_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation coverage (§2.5 breadth): per-(lang, source)
    doc/char totals plus per-lang and grand-total super-aggregate rows
    in ONE pass — Catalyst expands the grouping sets and the partial
    aggregation still combines map-side (3x the group rows of a plain
    groupBy over a tiny key space; never a fact-table blowup).  Data
    columns are non-null by fixture contract, so COALESCE('ALL')
    disambiguates super-aggregate rows without grouping_id bitmask
    semantics (which differ in bit order across engines)."""
    return (
        _docs(spark, sf_dir)
        .rollup("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
        .select(
            F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang_g"),
            F.coalesce(F.col("source"), F.lit("ALL")).alias("source_g"),
            "n_docs", "chars",
        )
    )


SQL_CORPUS_ROLLUP = """
SELECT COALESCE(lang, 'ALL') AS lang_g,
       COALESCE(source, 'ALL') AS source_g,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY ROLLUP(lang, source)
"""

REGISTRY["corpus_rollup"] = (q_corpus_rollup, SQL_CORPUS_ROLLUP)


_PIVOT_LANGS = ["de", "en", "es", "fr", "zh"]


def q_lang_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT coverage: per-source doc counts pivoted into one column
    per language.  The pivot value list is EXPLICIT (fixture lang set)
    — an implicit pivot runs an extra distinct pass over the data to
    discover values, which at 100 TB is a full scan spent inferring
    what the caller already knows; empty cells coalesce to 0 to match
    the oracle's FILTER counts."""
    piv = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .pivot("lang", _PIVOT_LANGS)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "source",
        *[F.coalesce(F.col(lg), F.lit(0)).cast("bigint").alias(lg)
          for lg in _PIVOT_LANGS],
    )


SQL_LANG_PIVOT = """
SELECT source,
       CAST(COUNT(*) FILTER (WHERE lang = 'de') AS BIGINT) AS de,
       CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS en,
       CAST(COUNT(*) FILTER (WHERE lang = 'es') AS BIGINT) AS es,
       CAST(COUNT(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS fr,
       CAST(COUNT(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS zh
FROM documents GROUP BY source
"""

REGISTRY["lang_pivot"] = (q_lang_pivot, SQL_LANG_PIVOT)


def q_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer statistical aggregates (mean + sample variance)
    per event_type: the fixture's 2-decimal values quantize to cents
    (round(value*100) — the multiply and the rounding are IEEE-
    identical in both engines), every sum then accumulates EXACT
    integers in DECIMAL(38,0)/HUGEINT (order-independent — the naive
    two-pass-free variance identity n*Σx² − (Σx)² is safe because
    nothing is rounded until the end), and the final mean/variance are
    ONE IEEE division each — bit-identical to the oracle, unlike
    stddev_samp/var_samp whose float accumulation order differs
    between engines."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cents = F.round(F.col("value") * 100).cast("decimal(38,0)")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(cents).alias("_s"),
            F.sum(cents * cents).alias("_ss"),
        )
        .select(
            "event_type", "n",
            (F.col("_s").cast("double") / (F.col("n") * 100))
            .alias("mean_value"),
            ((F.col("n") * F.col("_ss") - F.col("_s") * F.col("_s"))
             .cast("double")
             / (F.col("n") * (F.col("n") - 1) * F.lit(10000.0)))
            .alias("var_value"),
        )
    )


SQL_VALUE_STATS = """
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(s AS DOUBLE) / (n * 100) AS mean_value,
       CAST(n * ss - s * s AS DOUBLE)
         / (n * (n - 1) * 10000.0) AS var_value
FROM (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(ROUND(value * 100) AS HUGEINT)) AS s,
         SUM(CAST(ROUND(value * 100) AS HUGEINT)
             * CAST(ROUND(value * 100) AS HUGEINT)) AS ss
  FROM events GROUP BY event_type
)
"""

REGISTRY["value_stats"] = (q_value_stats, SQL_VALUE_STATS)


_EXISTS_SQL_BODY = """
SELECT c_custkey, c_name
FROM {cust} c
WHERE EXISTS (SELECT 1 FROM {ords} o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 150000)
  AND NOT EXISTS (SELECT 1 FROM {ords} o2
                  WHERE o2.o_custkey = c.c_custkey
                    AND o2.o_orderstatus = 'F')
"""


def q_exists_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.sql() SURFACE coverage: the same ANSI text the oracle
    runs, with correlated EXISTS / NOT EXISTS subqueries — Catalyst
    DECORRELATES both into left-semi / left-anti hash joins (no
    per-row subquery execution exists in Spark at all; the plan is
    two equi-joins AQE can broadcast or skew-split).  Everything else
    in the engine is DataFrame-API by policy; this query pins that
    the SQL entry point and the subquery rewrite behave identically."""
    spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .createOrReplaceTempView("v_customer")
    spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .createOrReplaceTempView("v_orders")
    return spark.sql(
        _EXISTS_SQL_BODY.format(cust="v_customer", ords="v_orders")
    )


REGISTRY["exists_customers"] = (
    q_exists_customers,
    _EXISTS_SQL_BODY.format(cust="customer", ords="orders"),
)


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD outlier flagging (operators/robust.mad_outliers): per
    event_type, |value - median| > 5 * MAD.  Medians are exact
    interpolating percentiles (the percentile_heights parity law);
    deviations round to 4 decimals before the second aggregation so
    both engines feed identical values forward.  Two tiny-key
    groupBys broadcast back — the fact table never shuffles."""
    from ..operators.robust import mad_outliers

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return mad_outliers(ev, k=5.0)


SQL_VALUE_OUTLIERS = """
WITH med AS (
  SELECT event_type,
         ROUND(QUANTILE_CONT(value, 0.5), 4) AS med
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_id, e.event_type, e.value,
         ROUND(ABS(e.value - m.med), 4) AS adev
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type,
         ROUND(QUANTILE_CONT(adev, 0.5), 4) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_id, d.event_type, d.value, d.adev,
       d.adev > 5.0 * m.mad AS is_outlier
FROM dev d JOIN mad m USING (event_type)
"""

REGISTRY["value_outliers"] = (q_value_outliers, SQL_VALUE_OUTLIERS)


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC interchange round trip (source/sink breadth beside parquet
    and JSONL): export the documents table as ORC — the other columnar
    format Spark bundles natively (zlib-compressed, splittable, with
    predicate pushdown like parquet) — and read it back.  Write-once
    into the digest-keyed scratch root; the value hash certifies the
    full encode/decode cycle against the parquet original."""
    import os

    from ..scratch import scratch_dir

    out = os.path.join(scratch_dir("orc", sf_dir), "documents_orc")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        _docs(spark, sf_dir).write.mode("overwrite").orc(out)
    return spark.read.orc(out).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


SQL_ORC_ROUNDTRIP = (
    "SELECT doc_id, text, lang, source, n_chars FROM documents"
)

REGISTRY["orc_roundtrip"] = (q_orc_roundtrip, SQL_ORC_ROUNDTRIP)


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation coverage (§2.4 beside U1/U2): purchasing users
    INTERSECT erroring users, tagged 'both', unioned with purchasing
    EXCEPT erroring, tagged 'only_purchase'.  Catalyst plans INTERSECT
    as a left-semi and EXCEPT as a left-anti over distinct inputs —
    the same dedup-then-join shape the engine uses by hand elsewhere,
    here through the declarative operators."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purch = ev.where(F.col("event_type") == "purchase").select("user_id")
    err = ev.where(F.col("event_type") == "error").select("user_id")
    both = purch.intersect(err).select(
        F.lit("both").alias("tag"), "user_id"
    )
    only = purch.subtract(err).select(
        F.lit("only_purchase").alias("tag"), "user_id"
    )
    return both.unionByName(only)


SQL_SET_OPS = """
SELECT 'both' AS tag, user_id FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'error'
)
UNION ALL
SELECT 'only_purchase' AS tag, user_id FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'error'
)
"""

REGISTRY["set_ops"] = (q_set_ops, SQL_SET_OPS)


def q_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min token-frequency estimates (operators/sketches
    cms_build/cms_estimate): a 4x256 counter table over every token
    occurrence (width deliberately small so real hash collisions —
    deterministic one-sided overestimates — are part of the value
    hash), probed with the distinct tokens of the doc_id%101 docs.
    Build = one map-only explode + a <= depth*width-cell hash agg;
    probe = broadcast sketch + per-probe min."""
    from ..operators.bm25 import _occurrences
    from ..operators.sketches import cms_build, cms_estimate

    docs = _docs(spark, sf_dir)
    occ = _occurrences(docs, "text", "doc_id").select("token")
    cms = cms_build(occ, "token", depth=4, width=256)
    probes = (
        _occurrences(docs.where(F.col("doc_id") % 101 == 0),
                     "text", "doc_id")
        .select("token").distinct()
    )
    return cms_estimate(probes, cms, "token", depth=4, width=256)


def _sql_cms_counts() -> str:
    from ..operators.sketches import sql_cms_estimate

    occ = (
        "SELECT UNNEST(CASE WHEN LENGTH(TRIM(COALESCE(text, ''))) = 0"
        " THEN CAST([] AS VARCHAR[])"
        " ELSE REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') END) AS token"
        " FROM documents{where}"
    )
    return sql_cms_estimate(
        build_keys_sql=occ.format(where=""),
        probes_sql=("SELECT DISTINCT token FROM ("
                    + occ.format(where=" WHERE doc_id % 101 = 0")
                    + ")"),
        depth=4, width=256,
    )


REGISTRY["cms_counts"] = (q_cms_counts, _sql_cms_counts())


def q_lm2_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM quality scoring (operators/lmscore.lm2_score): the
    conditional-probability upgrade of lm_score — add-one bigram
    model P(w2|w1) = (cnt2+1)/(cnt1+V) self-trained on the corpus,
    per-doc cost in EXACT integer bits, milli-bits-per-bigram
    normalization, tertile-threshold keep.  Bigrams are built
    MAP-ONLY (arrays_zip over shifted slices — no HOF lambda, no
    position join); the probe is two AQE-splittable equi-joins."""
    from ..operators.lmscore import lm2_score, lm2_train, lm_train

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return lm2_score(docs, lm_train(docs), lm2_train(docs)).select(
        "doc_id", "lm2_bits", "lm2_mbits_big", "lm2_kept")


def _sql_lm2_score() -> str:
    from ..operators.lmscore import sql_lm2_score

    return sql_lm2_score()


REGISTRY["lm2_score"] = (q_lm2_score, _sql_lm2_score())


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
