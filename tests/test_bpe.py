"""BPE merge training vs an independent pure-Python reference: the
classic dict-based trainer (word-freq table, adjacent-pair counts,
greedy left-to-right merge) must produce the identical merge list."""

from __future__ import annotations

from collections import Counter


def _reference_bpe(texts: list[str], rounds: int):
    words = Counter()
    for t in texts:
        for w in t.split():
            words[w] += 1
    state = {tuple(list(w) + ["</w>"]): f for w, f in words.items()}
    merges = []
    for r in range(rounds):
        pairs = Counter()
        for syms, f in state.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # max count, ties by pair ascending (byte order on the
        # US-joined key == tuple order for ASCII symbols)
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, a, b, cnt))
        new_state = {}
        for syms, f in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_state[key] = new_state.get(key, 0) + f
        state = new_state
    return merges


def test_bpe_matches_pure_python_reference(spark):
    from label_maker_dask_spark.operators.bpe import bpe_train_merges

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the lazy dog sleeps while the quick fox runs",
        "pack my box with five dozen liquor jugs",
        "how vexingly quick daft zebras jump",
        "the the the quick quick lazy lazy lazy dogs",
        "aaa aaab aab ab ab ab abb abab ababab",
    ]
    want = _reference_bpe(texts, 10)
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [tuple(r) for r in bpe_train_merges(docs, rounds=10).collect()]
    assert got == want


def test_bpe_oracle_matches_operator_small(spark):
    """The unrolled DuckDB oracle replays the operator exactly on the
    real documents table (sf0.001, 12 rounds)."""
    import duckdb

    from label_maker_dask_spark.operators.bpe import (
        bpe_merges_oracle_sql,
        bpe_train_merges,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = [tuple(r) for r in bpe_train_merges(docs, rounds=12).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = [tuple(r) for r in con.execute(bpe_merges_oracle_sql(12)).fetchall()]
    assert got == want and len(got) == 12


def test_bpe_exhausts_gracefully(spark):
    """Fewer possible merges than rounds: the loop stops when no pair
    remains (single-symbol words only)."""
    from label_maker_dask_spark.operators.bpe import bpe_train_merges

    docs = spark.createDataFrame([("a a a",)], "text string")
    got = [tuple(r) for r in bpe_train_merges(docs, rounds=5).collect()]
    # 'a </w>' -> 'a</w>' is the only merge; then every word is one symbol
    assert got == [(0, "a", "</w>", 3)]


def test_bpe_tokenize_matches_reference(spark):
    """Applying the trained tokenizer per document matches the pure-
    Python reference's final word->symbols mapping summed per doc."""
    from label_maker_dask_spark.operators.bpe import (
        bpe_tokenized_words,
        doc_word_rows,
    )
    from pyspark.sql import functions as F

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the lazy dog sleeps while the quick fox runs",
        "aaa aaab aab ab ab ab abb abab ababab",
    ]
    # reference: replay merges on the word-type dict
    words = {}
    for t in texts:
        for w in t.split():
            words[w] = words.get(w, 0) + 1
    state = {w: tuple(list(w) + ["</w>"]) for w in words}
    from tests.test_bpe import _reference_bpe

    merges = _reference_bpe(texts, 6)
    for _, a, b, _c in merges:
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = tuple(out)
    want = sorted(
        (d, sum(1 for w in t.split() for _ in [0]),
         sum(len(state[w]) for w in t.split()))
        for d, t in enumerate(texts)
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    wl = bpe_tokenized_words(docs, rounds=6)
    got = sorted(
        map(
            tuple,
            doc_word_rows(docs)
            .join(wl.select("word", "n_symbols"), "word")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_words"),
                F.sum("n_symbols").alias("n_symbols"),
            )
            .collect(),
        )
    )
    want = [(d, nw, int(ns)) for d, nw, ns in want]
    got = [(d, nw, int(ns)) for d, nw, ns in got]
    assert got == want


def test_bpe_tokenize_oracle_survives_dryout(spark):
    """Training that dries out before `rounds` merges must leave the
    oracle's final state intact (identity replace on empty argmax), not
    NULL-propagated — Spark and the oracle must agree on the per-doc
    symbol counts."""
    import duckdb
    import pandas as pd

    from label_maker_dask_spark.operators.bpe import (
        bpe_tokenize_oracle_sql,
        bpe_tokenized_words,
        doc_word_rows,
    )
    from pyspark.sql import functions as F

    texts = [(1, "ab ab")]
    docs = spark.createDataFrame(texts, "doc_id int, text string")
    wl = bpe_tokenized_words(docs, rounds=4)
    got = sorted(
        map(
            tuple,
            doc_word_rows(docs)
            .join(wl.select("word", "n_symbols"), "word")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_words"),
                F.sum("n_symbols").alias("n_symbols"),
            )
            .collect(),
        )
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(texts, columns=["doc_id", "text"]))
    want = sorted(
        map(tuple, con.execute(bpe_tokenize_oracle_sql(4)).fetchall())
    )
    assert got == want
    assert all(ns is not None for _, _, ns in want)
    # 'ab' -> merges exhaust at 2 ('a'+'b', then 'ab'+'</w>'): one
    # symbol per word
    assert want == [(1, 2, 2)]


def test_bpe_property_random_corpora(spark):
    """Hypothesis sweep: random small corpora (random alphabets, word
    lengths, repetition structure) must train to exactly the pure-Python
    reference's merge list — ties, dry-out, and single-char words
    included."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from label_maker_dask_spark.operators.bpe import bpe_train_merges

    word = st.text(alphabet="abcxy", min_size=1, max_size=5)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    @given(
        docs=st.lists(
            st.lists(word, min_size=1, max_size=8).map(" ".join),
            min_size=1,
            max_size=5,
        ),
        rounds=st.integers(1, 5),
    )
    def check(docs, rounds):
        want = _reference_bpe(docs, rounds)
        df = spark.createDataFrame([(t,) for t in docs], "text string")
        got = [tuple(r) for r in bpe_train_merges(df, rounds).collect()]
        assert got == want

    check()


def test_bpe_vertical_tab_whitespace_parity(spark):
    """Java's \\s includes \\x0B, RE2's does not — the tokenizer spells
    the whitespace class explicitly so BOTH engines split a vertical
    tab.  Cross-engine BPE training on \\x0B input must hash-match."""
    import duckdb
    import pandas as pd

    from label_maker_dask_spark.operators.bpe import (
        bpe_merges_oracle_sql,
        bpe_train_merges,
    )

    texts = [(1, "ab\x0bcd ef ab"), (2, "cd\x0bef ab cd")]
    docs = spark.createDataFrame(texts, "doc_id int, text string")
    got = [tuple(r) for r in bpe_train_merges(docs, rounds=3).collect()]
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(texts, columns=["doc_id", "text"])
    )
    want = [
        tuple(r) for r in con.execute(bpe_merges_oracle_sql(3)).fetchall()
    ]
    assert got == want and len(got) == 3
