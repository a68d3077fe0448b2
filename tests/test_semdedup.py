"""semdedup: planted semantic duplicates, min-id survivor rule,
cluster-cap bounding, and cross-cluster blindness."""

import numpy as np
import pytest

from batch3dfier_spark.operators.semdedup import semdedup


def _emb_df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def test_planted_duplicates_mark_higher_id(spark):
    rng = np.random.default_rng(7)
    base = [_unit(rng.normal(size=8)) for _ in range(6)]
    # vectors 6 and 7 duplicate vector 0 (tiny jitter keeps cos > 0.99)
    vecs = base + [_unit(base[0] + 1e-3), _unit(base[0] + 2e-3)]
    out = {
        r["vec_id"]: r["is_dup"]
        for r in semdedup(
            _emb_df(spark, vecs), threshold=0.95, n_centroids=4
        ).collect()
    }
    assert len(out) == 8
    assert out[0] is False          # min-id survivor keeps
    assert out[6] and out[7]        # later copies pruned


def test_orthogonal_vectors_no_dups(spark):
    vecs = [np.eye(8)[i] for i in range(8)]
    out = semdedup(_emb_df(spark, vecs), threshold=0.5, n_centroids=4)
    assert all(not r["is_dup"] for r in out.collect())


def test_cluster_cap_bounds_comparisons(spark):
    # 40 identical vectors: with cluster_cap=8 only capped members can
    # be marked (ids beyond the cap never enter a candidate pair)
    vecs = [_unit([1.0] * 8)] * 40
    out = {
        r["vec_id"]: r["is_dup"]
        for r in semdedup(
            _emb_df(spark, vecs), threshold=0.99, n_centroids=1,
            cluster_cap=8,
        ).collect()
    }
    dup_ids = {i for i, d in out.items() if d}
    assert dup_ids == set(range(1, 8))  # capped members minus survivor


def test_assignment_is_cluster_local(spark):
    # two well-separated groups: a near-duplicate pair split across
    # clusters is never compared, so neither member is marked
    a, b = _unit([1, 0, 0, 0]), _unit([0, 1, 0, 0])
    vecs = [a, b, _unit([1, 1e-3, 0, 0]), _unit([1e-3, 1, 0, 0])]
    out = semdedup(_emb_df(spark, vecs), threshold=0.99, n_centroids=2)
    rows = {r["vec_id"]: r for r in out.collect()}
    # members 2/3 join the cluster of their nearest seed (0 or 1) and
    # duplicate the seed there
    assert rows[2]["is_dup"] and rows[3]["is_dup"]
    assert rows[2]["cid"] != rows[3]["cid"]


def test_output_covers_every_vector_once(spark):
    rng = np.random.default_rng(11)
    vecs = [_unit(rng.normal(size=8)) for _ in range(50)]
    out = semdedup(_emb_df(spark, vecs), threshold=0.9, n_centroids=8)
    ids = [r["vec_id"] for r in out.collect()]
    assert sorted(ids) == list(range(50))


def test_far_centroid_keeps_least_typical(spark):
    # one cluster: seed s, a copy of s, and a jittered copy; min_id
    # keeps vector 0, far_centroid keeps the member with the LOWEST
    # centroid cosine among each duplicate pair
    rng = np.random.default_rng(3)
    s = _unit(rng.normal(size=8))
    vecs = [s, _unit(s + 5e-3), _unit(s + 1e-2)]
    min_id = {
        r["vec_id"]: r["is_dup"]
        for r in semdedup(
            _emb_df(spark, vecs), threshold=0.95, n_centroids=1
        ).collect()
    }
    far = {
        r["vec_id"]: r["is_dup"]
        for r in semdedup(
            _emb_df(spark, vecs), threshold=0.95, n_centroids=1,
            keep="far_centroid",
        ).collect()
    }
    assert min_id == {0: False, 1: True, 2: True}
    # vector 0 IS the centroid (cosine 1.0) -> most typical -> pruned;
    # vector 2 is farthest from the centroid -> kept
    assert far[0] is True
    assert far[2] is False


def test_far_centroid_no_dups_is_noop(spark):
    vecs = [np.eye(8)[i] for i in range(6)]
    out = semdedup(
        _emb_df(spark, vecs), threshold=0.5, n_centroids=3,
        keep="far_centroid",
    )
    assert all(not r["is_dup"] for r in out.collect())


def test_semdedup_rejects_unknown_keep(spark):
    with pytest.raises(ValueError):
        semdedup(_emb_df(spark, [np.eye(4)[0]]), keep="best")


def test_semdedup_cap_windows_are_salted(spark):
    """The cluster-cap selection must be the two-level salted shape:
    two Window nodes, the first partitioned by (cid, id % salt) — a
    mega-cluster can never land on one task as a single window
    partition."""
    rng = np.random.default_rng(5)
    vecs = [_unit(rng.normal(size=8)) for _ in range(40)]
    plan = (
        semdedup(_emb_df(spark, vecs), n_centroids=4, salt_buckets=32)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # two Window nodes per capped-selection (salted then final), and
    # the selection appears on BOTH sides of the candidate self-join
    assert plan.count("Window") == 4
    assert "% 32" in plan  # the salt term feeding the first partition
    # the salted window's partition spec carries the salt column
    import re

    salted = [l for l in plan.splitlines()
              if "windowspecdefinition" in l and "_w0" in l]
    assert len(salted) == 2
