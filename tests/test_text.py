"""Text-analysis expression library: golden values + cross-engine hash parity."""

import duckdb
from pyspark.sql import Row
from pyspark.sql import functions as F

from label_maker_dask_spark.functions import text as T


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        schema="doc_id long, text string",
    )


def test_tokens_edge_cases(spark):
    df = _df(spark, ["a b  c", "  leading trailing  ", "", "one"])
    out = {r.doc_id: r.t for r in df.select("doc_id", T.tokens(F.col("text")).alias("t")).collect()}
    assert out[0] == ["a", "b", "c"]
    assert out[1] == ["leading", "trailing"]
    assert out[2] == []
    assert out[3] == ["one"]


def test_char_poly_hash_matches_python_and_duckdb(spark):
    texts = ["abc", "hello world", "", "x", "the quick brown fox"]
    df = _df(spark, texts).select(
        "doc_id", T.char_poly_hash(F.col("text")).alias("h")
    )
    got = {r.doc_id: r.h for r in df.collect()}

    def py_fold(s):
        h = 0
        for c in s:
            h = (h * T.HASH_MULT + ord(c)) % T.HASH_P
        return h

    con = duckdb.connect()
    for i, t in enumerate(texts):
        assert got[i] == py_fold(t), t
        ddb = con.execute(
            f"SELECT {T.char_poly_hash_sql('?')}", [t]
        ).fetchone()[0]
        assert ddb == py_fold(t), t


def test_shingle_hash_combination_matches_oracle(spark):
    texts = ["a b c d e", "one two three", "too short"]
    df = _df(spark, texts)
    th = T.token_hashes(T.tokens(F.col("text")))
    out = {
        r.doc_id: r.s
        for r in df.select("doc_id", th.alias("th"))
        .select("doc_id", T.shingle_hashes_from(F.col("th")).alias("s"))
        .collect()
    }
    con = duckdb.connect()
    toks_sql = "list_filter(string_split_regex(trim(t), '\\s+'), x -> x != '')"
    for i, t in enumerate(texts):
        ddb = con.execute(
            f"SELECT {T.shingle_hashes_sql(toks_sql)} FROM (SELECT ? AS t)", [t]
        ).fetchone()[0]
        assert list(out[i]) == list(ddb), t
    assert out[2] == []  # 2 tokens -> no 3-shingles


def test_punct_and_stopword_ratios(spark):
    df = _df(spark, ["Hello, world! the end.", "nopunct", ""])
    out = df.select(
        "doc_id",
        T.punct_ratio(F.col("text")).alias("p"),
        T.stopword_ratio(T.tokens(F.col("text"))).alias("s"),
    ).collect()
    rows = {r.doc_id: r for r in out}
    assert abs(rows[0].p - 3 / 22) < 1e-9          # ',', '!', '.'
    assert abs(rows[0].s - 1 / 4) < 1e-9           # "the" of 4 tokens
    assert rows[1].p == 0.0 and rows[1].s == 0.0
    assert rows[2].p == 0.0 and rows[2].s == 0.0   # empty text guarded


def test_quality_score_bounds(spark):
    df = _df(spark, [
        "the quick brown fox jumps over a lazy dog near the river bank",
        "!!!! ???? ....",
        "ok",
    ])
    out = {r.doc_id: r.q for r in df.select(
        "doc_id", T.quality_score(F.col("text")).alias("q")).collect()}
    assert out[0] == 1.0                       # long, clean, stopworded
    assert 0.0 <= out[1] < 1.0
    assert 0.0 <= out[2] < 1.0                 # too short
