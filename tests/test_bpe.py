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
