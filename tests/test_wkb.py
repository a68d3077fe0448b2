"""F15: EWKB hex encoding — numpy twin vs struct.pack spec vs Spark UDF."""

import struct

import numpy as np
import pandas as pd

from batch3dfier_spark.functions.wkb import (
    EWKB_SRID_DEFAULT,
    ewkb_point_hex_np,
    ewkb_point_hex_udf,
)


def _spec(x: float, y: float, srid: int = EWKB_SRID_DEFAULT) -> str:
    """Readable per-point spec: PostGIS EWKB for SRID=srid;POINT(x y)."""
    return struct.pack("<BII dd", 1, 0x20000001, srid, x, y).hex().upper()


def test_matches_struct_spec():
    rng = np.random.RandomState(3)
    xs = rng.rand(500) * 1e6 - 5e5
    ys = rng.rand(500) * 1e6 - 5e5
    got = ewkb_point_hex_np(xs, ys)
    for i in range(500):
        assert got[i] == _spec(float(xs[i]), float(ys[i]))


def test_known_golden():
    # hand-checkable golden: SRID=28992;POINT(1.5 2.25)
    out = ewkb_point_hex_np(np.array([1.5]), np.array([2.25]))[0]
    assert out == "010100002040710000000000000000F83F0000000000000240"


def test_spark_udf_twin(spark):
    pdf = pd.DataFrame({"x": [120700.0, 121000.25], "y": [486000.5, 486400.0]})
    df = spark.createDataFrame(pdf)
    got = (
        df.withColumn("ewkb", ewkb_point_hex_udf()("x", "y"))
        .toPandas()["ewkb"]
        .tolist()
    )
    exp = [_spec(r.x, r.y) for r in pdf.itertuples()]
    assert got == exp
