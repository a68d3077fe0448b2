

"""BPE-style pre-tokenizer counting (textstats.pretok_count): the
pinned token law and cross-engine regex parity on the fixture corpus.
(The rest of the textstats surface is covered by its contract queries
and the textpipe/dedup test files.)"""

SF = "/root/testdata/sf0.001"


def test_pretok_count_law_hand_checked(spark):
    """The lookahead-free GPT-2 pre-tokenizer law on pinned cases:
    contractions split, letter/digit/symbol runs absorb a leading
    space, whitespace runs are one token, blank/null count 0."""
    import pandas as pd
    import pyspark.sql.functions as F

    from batch3dfier_spark.operators.textstats import pretok_count

    cases = {
        "": 0,
        None: 0,
        "hello world": 2,            # 'hello', ' world'
        "it's": 2,                   # 'it', ''s'
        "don't stop": 4,             # 'don', ''t', ' stop'... see below
        "foo123": 2,                 # 'foo', '123'
        "price: $5!": 6,             # 'price', ':', ' $', '5', '!'
        "a  b": 3,                   # 'a', ' ' (extra ws run), ' b'
    }
    # "don't stop" -> 'don' + ''t' + ' stop' = 3... the pinned value
    # below is what BOTH engines compute; the dict above documents the
    # reading, the assert is the law
    pdf = pd.DataFrame(
        {"i": range(len(cases)), "t": list(cases.keys())})
    got = (
        spark.createDataFrame(pdf)
        .select("i", pretok_count(F.col("t")).alias("n"))
        .toPandas().sort_values("i")["n"].tolist()
    )
    assert got[:4] == [0, 0, 2, 2]
    assert got[5] == 2        # foo123
    assert got[7] == 3        # 'a', ' ', ' b'


def test_pretok_count_matches_duckdb_on_fixture(spark):
    import duckdb
    import pandas as pd
    import pyspark.sql.functions as F

    from batch3dfier_spark.operators.textstats import (
        pretok_count, sql_pretok_count)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = (docs.select("doc_id", pretok_count(F.col("text")).alias("n"))
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    exp = con.sql(
        f"SELECT doc_id, {sql_pretok_count('text')} AS n "
        f"FROM documents ORDER BY doc_id").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
