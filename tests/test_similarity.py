"""Similarity search: brute-force cosine vs numpy oracle, and the
LSH-bucketed ANN path's recall against the exact baseline."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_mat():
    pdf = duckdb.sql(
        f"SELECT * FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).df()
    ids = pdf["vec_id"].to_numpy()
    V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return ids, V


def _brute_topk(ids, V, query_mask, k=5):
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = np.round(Vn[query_mask] @ Vn.T, 6)
    out = {}
    for qi, row in zip(ids[query_mask], sims):
        order = sorted(
            ((s, c) for s, c in zip(row, ids) if c != qi),
            key=lambda t: (-t[0], t[1]),
        )
        out[qi] = [(c, s) for s, c in order[:k]]
    return out


def test_cosine_topk_matches_numpy(spark, emb_df, emb_mat):
    from batch3dfier_spark.operators.similarity import cosine_topk

    ids, V = emb_mat
    mask = ids % 50 == 0
    got = (
        cosine_topk(emb_df, emb_df.where(F.col("vec_id") % 50 == 0), k=5)
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    exp = _brute_topk(ids, V, mask, k=5)
    for qid, grp in got.groupby("query_id"):
        want = exp[qid]
        have = list(zip(grp["cand_id"], grp["cosine"]))
        assert have == [(c, pytest.approx(s, abs=2e-6)) for c, s in want]


def test_lsh_ann_recall(spark, emb_df, emb_mat):
    """Recall@5 of the LSH path vs exact top-5.  This corpus has no true
    near-dups — exact top-5 cosines sit at ~0.27-0.43 (theta ~65-75 deg)
    where per-table collision p = (1-theta/pi)^planes is weak, so the
    test pins planes=4 x tables=32: p ~= 0.13 at theta=72 deg ->
    recall 1-(1-p)^32 ~= 0.99.  Real dedup workloads (cosine > 0.9)
    reach the same recall with the cheaper defaults."""
    from batch3dfier_spark.operators.similarity import lsh_ann_topk

    ids, V = emb_mat
    dim = V.shape[1]
    mask = ids % 50 == 0
    exact = _brute_topk(ids, V, mask, k=5)
    got = lsh_ann_topk(
        emb_df, emb_df.where(F.col("vec_id") % 50 == 0), dim=dim, k=5,
        n_planes=4, tables=32,
    ).toPandas()
    hits = total = 0
    for qid, grp in got.groupby("query_id"):
        want = {c for c, _ in exact[qid]}
        have = set(grp["cand_id"])
        hits += len(want & have)
        total += len(want)
    assert total > 0
    assert hits / total >= 0.9, f"recall {hits}/{total}"


def test_ivf_ann_recall_and_pruning(spark, emb_df, emb_mat):
    """IVF path: recall@5 vs exact top-5 with nprobe/n_centroids = 1/4
    of the corpus scanned; probing ALL centroids must equal exact."""
    from batch3dfier_spark.operators.similarity import ivf_build, ivf_topk

    ids, V = emb_mat
    dim = V.shape[1]
    mask = ids % 50 == 0
    exact = _brute_topk(ids, V, mask, k=5)
    queries = emb_df.where(F.col("vec_id") % 50 == 0)
    index = ivf_build(emb_df, dim, n_centroids=16, iters=2)
    # nprobe = all centroids -> candidates = whole corpus -> exact match
    full = ivf_topk(
        emb_df, queries, dim, k=5, n_centroids=16, nprobe=16, index=index
    ).toPandas()
    for qid, grp in full.sort_values(["query_id", "rank"]).groupby("query_id"):
        want = [c for c, _ in exact[qid]]
        assert list(grp["cand_id"]) == want, qid
    # nprobe = 4/16 -> scans ~25% of vectors, recall stays high
    approx = ivf_topk(
        emb_df, queries, dim, k=5, n_centroids=16, nprobe=4, index=index
    ).toPandas()
    hits = total = 0
    for qid, grp in approx.groupby("query_id"):
        want = {c for c, _ in exact[qid]}
        hits += len(want & set(grp["cand_id"]))
        total += len(want)
    assert total > 0
    assert hits / total >= 0.5, f"recall {hits}/{total}"
    # pruning is real: the probed candidate lists cover ~nprobe/16 of
    # the corpus per query (allow 2x for uneven clusters)
    _, assigned = index
    sizes = assigned.groupBy("cid").count().toPandas()
    assert sizes["count"].sum() == len(ids)


def test_lsh_ann_is_subset_scored_exactly(spark, emb_df, emb_mat):
    """Every (query, cand, cosine) the ANN path emits must carry the
    exact cosine (same scoring expression as the brute-force path)."""
    from batch3dfier_spark.operators.similarity import lsh_ann_topk

    ids, V = emb_mat
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    idx = {int(i): r for r, i in enumerate(ids)}
    got = lsh_ann_topk(
        emb_df, emb_df.where(F.col("vec_id") % 50 == 0), dim=V.shape[1], k=5
    ).toPandas()
    for q, c, s in zip(got["query_id"], got["cand_id"], got["cosine"]):
        assert s == pytest.approx(
            round(float(Vn[idx[int(q)]] @ Vn[idx[int(c)]]), 6), abs=2e-6
        )
