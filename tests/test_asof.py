"""As-of join: hand-checked match semantics (inclusive ties, latest
right-id wins, no-match NULLs, tolerance), engine == mirrored-window
DuckDB oracle, and partition-independence."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

TS = pd.Timestamp


def _frames():
    left = pd.DataFrame({
        "event_id": [100, 101, 102, 103],
        "user_id": [1, 1, 2, 3],
        "ts": [TS("2024-01-01 10:00"), TS("2024-01-01 12:00"),
               TS("2024-01-01 09:00"), TS("2024-01-01 09:00")],
        "value": [10.0, 20.0, 30.0, 40.0],
    })
    right = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [1, 1, 1, 2, 2],
        "ts": [TS("2024-01-01 09:30"), TS("2024-01-01 11:00"),
               TS("2024-01-01 11:00"), TS("2024-01-01 09:00"),
               TS("2024-01-01 09:30")],
        "value": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    return left, right


def test_asof_semantics_hand_checked(spark):
    from batch3dfier_spark.operators.asof import as_of_join

    left, right = _frames()
    out = (
        as_of_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on="user_id", right_cols=["value"],
        )
        .toPandas().set_index("event_id")
    )
    # user 1 @10:00 -> click 1 (@09:30)
    assert out.loc[100, "event_id_r"] == 1
    # user 1 @12:00 -> two right rows tie at 11:00; larger id (3) wins
    assert out.loc[101, "event_id_r"] == 3
    assert out.loc[101, "value_r"] == 3.0
    # user 2 @09:00 -> right row AT 09:00 matches (inclusive as-of)
    assert out.loc[102, "event_id_r"] == 4
    # user 3: no right rows at all -> NULLs
    assert pd.isna(out.loc[103, "event_id_r"])
    assert pd.isna(out.loc[103, "ts_r"])


def test_asof_tolerance(spark):
    from batch3dfier_spark.operators.asof import as_of_join

    left, right = _frames()
    out = (
        as_of_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on="user_id", right_cols=["value"], tolerance_s=1800,
        )
        .toPandas().set_index("event_id")
    )
    assert out.loc[100, "event_id_r"] == 1      # 30 min ago: kept
    assert pd.isna(out.loc[101, "event_id_r"])  # 60 min ago: stale
    assert out.loc[102, "event_id_r"] == 4      # 0 s: kept


def test_asof_matches_oracle_with_tolerance(spark):
    """Engine == mirrored-window oracle on the real events table,
    including the tolerance path."""
    from batch3dfier_spark.operators.asof import as_of_join, sql_as_of_join
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = as_of_join(
        ev.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"),
        ev.where(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts", "value"),
        on="user_id", right_cols=["value"], tolerance_s=7200,
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    exp = con.sql(sql_as_of_join(
        left_sql="SELECT event_id, user_id, ts, value FROM events "
                 "WHERE event_type = 'purchase'",
        right_sql="SELECT event_id, user_id, ts, value FROM events "
                  "WHERE event_type = 'click'",
        on="user_id",
        left_cols=["event_id", "user_id", "ts", "value"],
        right_cols=["value"], tolerance_s=7200,
    )).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    # normalize pandas datetime resolution (Spark -> ns, DuckDB -> us)
    for df_ in (got, exp):
        for c in cols:
            if pd.api.types.is_datetime64_any_dtype(df_[c]):
                df_[c] = df_[c].astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        got[cols].sort_values("event_id").reset_index(drop=True),
        exp[cols].sort_values("event_id").reset_index(drop=True),
        check_dtype=False,
    )
    # both matched and stale/unmatched rows occur -> the compare is real
    assert got["event_id_r"].notna().any() and got["event_id_r"].isna().any()


def test_asof_partition_independence(spark):
    from batch3dfier_spark.operators.asof import as_of_join

    left, right = _frames()
    a = as_of_join(
        spark.createDataFrame(left).repartition(1),
        spark.createDataFrame(right).repartition(1),
        on="user_id", right_cols=["value"],
    ).toPandas()
    b = as_of_join(
        spark.createDataFrame(left).repartition(5),
        spark.createDataFrame(right).repartition(3),
        on="user_id", right_cols=["value"],
    ).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("event_id").reset_index(drop=True),
        b.sort_values("event_id").reset_index(drop=True),
    )
