"""Pre-flight twin of the driver's CORRECTNESS gate.

Runs every __spark_entry__.queries() entry and its oracle_sql() twin on
the same sf dir, compares row count, column names, and a value hash
over column-name-sorted, row-sorted, 4-decimal-rounded values — the
same comparison shape the driver uses.

Usage: python tools/check_oracles.py [sf_dir] [--cores N]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(4)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else
                (str(list(np.round(v, 4))) if isinstance(v, (list, np.ndarray)) else v)
            )
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        df.to_csv(index=False, float_format="%.4f").encode()
    ).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cores = 8
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])

    from batch3dfier_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="oracle-check", cores=cores,
                      shuffle_partitions=2 * cores)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from read_parquet('{p}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name in sorted(qs):
        try:
            got = qs[name](spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, no oracle)")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {ex}")
            failures += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        if not problems:
            hg, he = value_hash(canon(got)), value_hash(canon(exp))
            if hg != he:
                problems.append(f"value-hash {hg} != {he}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"ok   {name}: {len(got)} rows, hash match")
    spark.stop()
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {len(qs) - failures}/{len(qs)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
