"""rrf_fuse: hand-computed integer fusion, one-sided candidates,
tie-breaking, and two-level-selection equivalence on a salted shape."""

import pytest

from batch3dfier_spark.operators.retrieval import rrf_fuse


def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "query_id bigint, cand_id bigint, rank bigint"
    )


def test_rrf_hand_computed(spark):
    # query 1: cand 10 is rank 1 in both lists -> 2 * (1e6 // 61)
    a = _ranked(spark, [(1, 10, 1), (1, 11, 2)])
    b = _ranked(spark, [(1, 10, 1), (1, 12, 2)])
    got = {
        r["cand_id"]: (r["rrf_q"], r["rank"])
        for r in rrf_fuse(a, b, k=5).collect()
    }
    c1, c2 = 1_000_000 // 61, 1_000_000 // 62
    assert got == {10: (2 * c1, 1), 11: (c2, 2), 12: (c2, 3)}


def test_rrf_one_sided_contributes_zero_from_other(spark):
    a = _ranked(spark, [(7, 1, 1)])
    b = _ranked(spark, [(7, 2, 1)])
    rows = rrf_fuse(a, b, k=5).collect()
    assert {r["cand_id"] for r in rows} == {1, 2}
    assert all(r["rrf_q"] == 1_000_000 // 61 for r in rows)


def test_rrf_tie_breaks_by_cand_id(spark):
    # both cands end with identical rrf_q -> lower cand_id ranks first
    a = _ranked(spark, [(1, 20, 1), (1, 5, 2)])
    b = _ranked(spark, [(1, 5, 1), (1, 20, 2)])
    rows = rrf_fuse(a, b, k=2).orderBy("rank").collect()
    assert [r["cand_id"] for r in rows] == [5, 20]
    assert rows[0]["rrf_q"] == rows[1]["rrf_q"]


def test_rrf_two_level_equals_global_topk(spark):
    # 40 candidates across every salt bucket; k=3 must be the global
    # best 3 regardless of the salted pre-selection
    a = _ranked(spark, [(1, c, c) for c in range(1, 41)])
    b = _ranked(spark, [(1, c, 41 - c) for c in range(1, 41)])
    rows = rrf_fuse(a, b, k=3, salt_buckets=8).orderBy("rank").collect()
    exp = sorted(
        (
            (1_000_000 // (60 + c)) + (1_000_000 // (60 + 41 - c))
            for c in range(1, 41)
        ),
        reverse=True,
    )[:3]
    assert [r["rrf_q"] for r in rows] == exp


def test_rrf_k_bounds_output(spark):
    a = _ranked(spark, [(1, c, c) for c in range(1, 30)])
    b = _ranked(spark, [(2, c, c) for c in range(1, 30)])
    counts = (
        rrf_fuse(a, b, k=4).groupBy("query_id").count().collect()
    )
    assert {r["count"] for r in counts} == {4}
