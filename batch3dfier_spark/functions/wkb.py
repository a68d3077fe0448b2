"""EWKB hex encoding (F15) — the reference's API-boundary geometry
serialization (batch3dfier/config.py:296-301 promotes the extent
polygon to EWKB hex with the index SRID; shapely's wkb_hex).

Two twins, same bytes:
- `ewkb_point_hex_np`: vectorized numpy encoder (little-endian WKB
  Point with the EWKB SRID flag, exactly what PostGIS emits for
  `SRID=28992;POINT(x y)`);
- `ewkb_point_hex_udf`: the Arrow-batched pandas UDF wrapper for the
  Spark side (IEEE-754 double bytes are not expressible as built-in
  Column functions, so this is a legitimate vectorized-UDF case).

Layout (little-endian):
    01            byte order (1 = LE)
    01000020      type: Point (1) | SRID flag (0x20000000)
    <srid: u32>
    <x: f64> <y: f64>
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["EWKB_SRID_DEFAULT", "ewkb_point_hex_np", "ewkb_point_hex_udf"]

EWKB_SRID_DEFAULT = 28992  # the reference's hard-coded CRS (EPSG:28992)

_HEX = np.array([f"{b:02X}" for b in range(256)])


def ewkb_point_hex_np(
    x: np.ndarray, y: np.ndarray, srid: int = EWKB_SRID_DEFAULT
) -> np.ndarray:
    """Vectorized (x, y) -> EWKB hex strings (uppercase, like
    shapely's wkb_hex)."""
    x = np.asarray(x, dtype="<f8")
    y = np.asarray(y, dtype="<f8")
    n = len(x)
    buf = np.empty((n, 25), dtype=np.uint8)
    buf[:, 0] = 0x01
    buf[:, 1:5] = np.frombuffer(
        np.uint32(0x20000001).astype("<u4").tobytes(), dtype=np.uint8
    )
    buf[:, 5:9] = np.frombuffer(
        np.uint32(srid).astype("<u4").tobytes(), dtype=np.uint8
    )
    buf[:, 9:17] = x.view(np.uint8).reshape(n, 8)
    buf[:, 17:25] = y.view(np.uint8).reshape(n, 8)
    # bytes -> hex, fully vectorized via a 256-entry lookup
    hx = _HEX[buf]  # (n, 25) of 2-char strings
    out = hx[:, 0]
    for j in range(1, 25):
        out = np.char.add(out, hx[:, j])
    return out


def ewkb_point_hex_udf(srid: int = EWKB_SRID_DEFAULT):
    """pandas_udf twin: df.withColumn("ewkb", ewkb_point_hex_udf()(x, y))."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def enc(xs: pd.Series, ys: pd.Series) -> pd.Series:
        return pd.Series(
            ewkb_point_hex_np(xs.to_numpy(), ys.to_numpy(), srid)
        )

    return enc
