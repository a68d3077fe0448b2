"""Neighbor resolution: interval-overlap join (J2) + grid kNN."""

import numpy as np
import pandas as pd
import pytest

from batch3dfier_spark import datagen
from batch3dfier_spark.geo import point_rect_distance
from batch3dfier_spark.operators.neighbors import (
    knn_tiles,
    tile_neighbor_pairs,
    tile_neighbors_spark,
)
from batch3dfier_spark.operators.tiler import TileIndex, with_geocode

T = datagen.REF_TERRITORY


def test_neighbor_pairs_reference_golden():
    """Golden from the reference (tests/test_config.py:78-95): footprint
    tile 25gn1_c1 resolves pc tiles [25gn1_a, 25gn1_b]."""
    ftpr = TileIndex(datagen.ref_tile_index())
    assets = TileIndex(datagen.ref_asset_index())
    pairs = tile_neighbor_pairs(ftpr, assets)
    c1 = sorted(pairs[pairs["ftpr_unit"] == "25gn1_c1"]["asset_unit"])
    assert c1 == ["25gn1_a", "25gn1_b"]
    assert len(pairs) == 8  # every footprint tile touches both halves


def test_spark_join_matches_driver_side(spark):
    ftpr = TileIndex.regular_grid(T, 6, 4)
    assets = TileIndex.regular_grid(T, 2, 2)
    got = (
        tile_neighbors_spark(ftpr.spark_df(spark), assets.spark_df(spark))
        .toPandas()
        .sort_values(["ftpr_gid", "asset_gid"])
        .reset_index(drop=True)
    )
    exp = (
        tile_neighbor_pairs(ftpr, assets)
        .sort_values(["ftpr_gid", "asset_gid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"ftpr_gid": "int64", "asset_gid": "int64"}),
        exp.astype({"ftpr_gid": "int64", "asset_gid": "int64"}),
    )


def test_neighbor_pairs_strtree_path():
    """>256 tiles on the b side flips to the STRtree path; must agree
    with the dense kernel."""
    a = TileIndex.regular_grid(T, 3, 3)
    b = TileIndex.regular_grid(T, 20, 20)  # 400 > 256
    got = set(map(tuple, tile_neighbor_pairs(a, b)[["ftpr_gid", "asset_gid"]].to_numpy()))
    from batch3dfier_spark.geo import rects_overlap_pairs

    ai, bi = rects_overlap_pairs(a.rects, b.rects)
    exp = set(
        zip(a.frame["gid"].to_numpy()[ai], b.frame["gid"].to_numpy()[bi])
    )
    assert got == exp


def test_knn_matches_bruteforce(spark, pages_df, pages_pdf):
    idx = TileIndex.regular_grid(T, 5, 5)
    k = 4
    geocoded = with_geocode(pages_df, T).limit(200)
    out = knn_tiles(geocoded, idx, k=k, keep=("url",)).toPandas()
    assert (out.groupby("url")["nn_rank"].count() == k).all()
    xy = out.drop_duplicates("url")[["url", "x", "y"]]
    d = point_rect_distance(xy["x"].to_numpy(), xy["y"].to_numpy(), idx.rects)
    gids = idx.frame["gid"].to_numpy()
    for i, url in enumerate(xy["url"]):
        order = np.lexsort((gids, d[i]))[:k]
        exp = gids[order].tolist()
        got = out[out["url"] == url].sort_values("nn_rank")["nn_gid"].tolist()
        assert got == exp, url
    # rank-1 distance is 0 for points inside a tile
    assert (out[out["nn_rank"] == 1]["nn_dist"] == 0).all()
