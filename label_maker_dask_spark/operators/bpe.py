"""Distributed BPE merge training — the tokenizer-TRAINING half of the
text family (the counting half is ``text_bpe_token_counts``'s regex
pre-tokenizer).

Classic byte-pair-encoding learns a merge list: start from characters,
repeatedly merge the globally most frequent adjacent symbol pair.  The
production-shaped decomposition (what HF tokenizers / SentencePiece do)
is:

1. ONE corpus-scale pass aggregates the word-frequency table — the only
   step that touches every token; everything after runs on word TYPES,
   a Zipf-bounded frame orders of magnitude smaller than the corpus.
2. Each merge round is a narrow aggregation over the type table
   (adjacent-pair counts weighted by word frequency), an argmax, and a
   per-type symbol-sequence rewrite.  Exactly ONE row (the winning
   pair) reaches the driver per round — the same bounded-collect
   contract as the IVF centroid seeds.

Determinism / oracle replay: symbol sequences are stored as strings
joined by a double US separator (``\\x1f\\x1f``, a character no token
contains — tokens are whitespace-split so they never contain control
separators we strip below), and a merge is ONE literal ``replace`` of
``US + left + US US + right + US`` with ``US + left·right + US`` on the
US-padded sequence.  Because symbols never contain US, the pattern can
only match at true symbol boundaries, and the double-separator join
keeps consecutive disjoint occurrences from sharing boundary characters
— so Spark's ``replace`` and DuckDB's ``replace`` (both left-to-right,
non-overlapping) rewrite identically, and the greedy left-to-right
semantics are exactly classic BPE's within-word merge order.  Ties on
the argmax break by pair string ascending (byte order in both engines).

100 TB posture: step 1 is the corpus scan (map-side combinable word
count); each round is O(types) with a 1-row collect; lineage is
truncated per round via :func:`materialize` so round r never replays
rounds 0..r-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from label_maker_dask_spark.operators.materialize import materialize

#: unit separator — the symbol-boundary character (never inside a symbol)
US = "\x1f"
#: end-of-word marker symbol (standard BPE; like any symbol it may also
#: be formed by merges of its characters — the classic accepted collision)
EOW = "</w>"


def _word_rows(docs: DataFrame, text_col: str, *keep_cols: str) -> DataFrame:
    """THE tokenize+normalize chain (whitespace split, control-char
    strip, empty drop) — one definition, so the training side and the
    per-document application side can never drift apart."""
    from label_maker_dask_spark.functions.text import tokens

    toks = F.explode(tokens(F.col(text_col))).alias("word")
    norm = F.regexp_replace("word", "[\\x00-\\x1f]", "")
    return (
        docs.select(*keep_cols, toks)
        .select(*keep_cols, norm.alias("word"))
        .where(F.col("word") != "")
    )


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-scale pass: whitespace tokens -> (word, freq).
    Control/separator characters are stripped from tokens so the US
    invariant holds on arbitrary input."""
    return _word_rows(docs, text_col).groupBy("word").agg(
        F.count(F.lit(1)).alias("freq")
    )


def doc_word_rows(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, word) rows under the SAME normalization as
    :func:`word_frequencies` (shared chain) — the join side for
    applying a trained tokenizer per document."""
    return _word_rows(docs, text_col, id_col)


def _initial_seq() -> F.Column:
    # characters (codepoint-safe split) joined by US US, plus the EOW
    # marker as the final symbol
    chars = F.filter(F.split("word", ""), lambda c: c != "")
    return F.concat(
        F.array_join(chars, US + US), F.lit(US + US + EOW)
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    syms = F.split("seq", US + US)
    n = F.size(syms)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pair = F.explode(
        F.transform(
            idx,
            lambda i: F.concat(
                F.element_at(syms, i), F.lit(US), F.element_at(syms, i + 1)
            ),
        )
    ).alias("pair")
    return (
        state.select(pair, "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame, rounds: int = 8, text_col: str = "text"
) -> tuple:
    """One training run, BOTH artifacts: ``(merges, tokenized_words)``
    — the merge list as (merge_rank, left_sym, right_sym, pair_count)
    and the trained tokenizer applied to every word type as
    (word, n_symbols, freq).  Use this when you need both;
    :func:`bpe_train_merges` / :func:`bpe_tokenized_words` are
    single-artifact conveniences that each run training once."""
    merges, state = _train(docs, rounds, text_col)
    mdf = docs.sparkSession.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, pair_count long",
    )
    n = F.size(F.split("seq", US + US))
    return mdf, state.select("word", n.alias("n_symbols"), "freq")


def bpe_train_merges(
    docs: DataFrame, rounds: int = 8, text_col: str = "text"
) -> DataFrame:
    """Learn ``rounds`` BPE merges over ``docs[text_col]``; returns the
    merge list — the tokenizer artifact — as (merge_rank, left_sym,
    right_sym, pair_count), ordered by rank."""
    return bpe_train(docs, rounds, text_col)[0]


def bpe_tokenized_words(
    docs: DataFrame, rounds: int = 8, text_col: str = "text"
) -> DataFrame:
    """Train ``rounds`` merges, then return the trained tokenizer APPLIED
    to every word type: (word, n_symbols, freq) — join a corpus's tokens
    to this frame (broadcast; it is the Zipf-bounded type table) to
    tokenize at scale without re-running any merge."""
    return bpe_train(docs, rounds, text_col)[1]


def bpe_symbol_vocab(
    docs: DataFrame, rounds: int = 8, text_col: str = "text"
) -> DataFrame:
    """The VOCABULARY artifact: every symbol of the round-``rounds``
    tokenizer with the number of word types containing it and its total
    corpus occurrence count (each in-word occurrence weighted by word
    frequency) — the vocab-sizing table next to the merge list."""
    _, state = _train(docs, rounds, text_col)
    sym = F.explode(F.split("seq", US + US)).alias("symbol")
    return (
        state.select("word", sym, "freq")
        .groupBy("symbol")
        .agg(
            F.count_distinct("word").alias("n_types"),
            F.sum("freq").alias("total_count"),
        )
    )


def bpe_vocab_oracle_sql(rounds: int = 8) -> str:
    """DuckDB twin of :func:`bpe_symbol_vocab` over the shared training
    CTE chain."""
    us = "chr(31)"
    ss = f"({us} || {us})"
    ctes = _bpe_ctes_sql(rounds)
    return f"""
    WITH {ctes}
    SELECT symbol,
           CAST(count(DISTINCT word) AS BIGINT) AS n_types,
           CAST(sum(freq) AS BIGINT) AS total_count
    FROM (SELECT word, unnest(string_split(seq, {ss})) AS symbol, freq
          FROM s{rounds})
    GROUP BY symbol
    """


def bpe_train_merges_from_frequencies(
    freqs: DataFrame, rounds: int = 8
) -> DataFrame:
    """Train from an EXISTING (word, freq) table — e.g. one maintained
    incrementally by the additive streaming sink — instead of scanning a
    corpus.  Because word counts are batch-split invariant, training on
    a stream-maintained table must equal batch training on the same
    corpus (gated by stream_bpe_word_freq_replay)."""
    merges, _ = _train(None, rounds, "text", freqs=freqs)
    return freqs.sparkSession.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, pair_count long",
    )


def _train(docs, rounds: int, text_col: str, freqs: DataFrame = None):
    wf = freqs if freqs is not None else word_frequencies(docs, text_col)
    state = materialize(
        wf.select("word", _initial_seq().alias("seq"), "freq")
    )
    merges = []
    for r in range(rounds):
        best = (
            _pair_counts(state)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["pair"].split(US)
        merges.append((r, left, right, int(best[0]["cnt"])))
        pat = US + left + US + US + right + US
        rep = US + left + right + US
        padded = F.concat(F.lit(US), F.col("seq"), F.lit(US))
        replaced = F.replace(padded, F.lit(pat), F.lit(rep))
        state = materialize(
            state.select(
                "word",
                F.substring(
                    replaced, 2, F.length(replaced) - 2
                ).alias("seq"),
                "freq",
            )
        )
    return merges, state


def bpe_merges_oracle_sql(rounds: int = 8) -> str:
    """DuckDB twin: unrolls every round — pair counts from the previous
    state, argmax with the identical (count desc, pair asc) tie-break,
    the identical padded literal replace — so the driver's hash gate
    proves training end-to-end."""
    ctes = _bpe_ctes_sql(rounds)
    finals = " UNION ALL ".join(
        f"SELECT {r} AS merge_rank, l AS left_sym, r AS right_sym, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM b{r}"
        for r in range(rounds)
    )
    return f"""
    WITH {ctes}
    SELECT * FROM ({finals}) ORDER BY merge_rank
    """


def bpe_tokenize_oracle_sql(rounds: int = 8) -> str:
    """DuckDB twin of training + APPLICATION: per-document word and
    symbol counts under the round-``rounds`` tokenizer (the trained
    state joined back to each document's tokens)."""
    us = "chr(31)"
    ss = f"({us} || {us})"
    ctes = _bpe_ctes_sql(rounds)
    return f"""
    WITH {ctes},
    wl AS MATERIALIZED (
      SELECT word, len(string_split(seq, {ss})) AS n_syms
      FROM s{rounds}),
    dtoks AS (
      SELECT doc_id, regexp_replace(t, '[\\x00-\\x1f]', '', 'g') AS word
      FROM (SELECT doc_id, unnest(list_filter(string_split_regex(trim(text),
                   '[ \\t\\n\\x0B\\f\\r]+'), t -> t != '')) AS t FROM documents)),
    dw AS (SELECT doc_id, word FROM dtoks WHERE word != '')
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_syms) AS BIGINT) AS n_symbols
    FROM dw JOIN wl USING (word)
    GROUP BY doc_id
    """


def _bpe_ctes_sql(rounds: int) -> str:
    us = "chr(31)"
    ss = f"({us} || {us})"
    # AS MATERIALIZED: DuckDB inlines multiply-referenced CTEs by
    # default, which makes round r re-derive rounds 0..r-1 once per
    # reference — exponential in rounds (measured: 6 rounds hung).
    # Materializing each round's state/argmax makes the unroll linear.
    parts = [
        f"""w AS MATERIALIZED (
      SELECT word, count(*) AS freq FROM (
        SELECT regexp_replace(t, '[\\x00-\\x1f]', '', 'g') AS word
        FROM (SELECT unnest(list_filter(string_split_regex(trim(text),
                     '[ \\t\\n\\x0B\\f\\r]+'), t -> t != '')) AS t FROM documents))
      WHERE word != '' GROUP BY word),
    s0 AS MATERIALIZED (
      SELECT word,
             list_aggregate(list_filter(string_split(word, ''),
                 c -> c != ''), 'string_agg', {ss})
               || {ss} || '</w>' AS seq,
             freq
      FROM w)"""
    ]
    for r in range(rounds):
        parts.append(
            f"""p{r} AS MATERIALIZED (
      SELECT sy[i] || {us} || sy[i+1] AS pair, sum(freq) AS cnt
      FROM (SELECT string_split(seq, {ss}) AS sy, freq FROM s{r}),
           LATERAL (SELECT unnest(generate_series(1,
                        greatest(len(sy) - 1, 0))) AS i)
      WHERE len(sy) >= 2
      GROUP BY 1),
    b{r} AS MATERIALIZED (
      SELECT string_split(pair, {us})[1] AS l,
             string_split(pair, {us})[2] AS r,
             cnt
      FROM p{r} ORDER BY cnt DESC, pair ASC LIMIT 1),
    s{r + 1} AS MATERIALIZED (
      SELECT word, substr(x, 2, length(x) - 2) AS seq, freq FROM (
        -- coalesce to the identity replace (US -> US) when b{{r}} is
        -- empty: a dried-out round must leave every sequence unchanged
        -- (the Spark side breaks out of the loop), not NULL-propagate
        SELECT word, replace({us} || seq || {us},
                       coalesce({us} || (SELECT l FROM b{r}) || {ss}
                            || (SELECT r FROM b{r}) || {us}, {us}),
                       coalesce({us} || (SELECT l FROM b{r})
                            || (SELECT r FROM b{r}) || {us}, {us})) AS x,
               freq
        FROM s{r}))"""
        )
    return ",\n    ".join(parts)


__all__ = [
    "bpe_train",
    "bpe_train_merges_from_frequencies",
    "bpe_symbol_vocab",
    "bpe_vocab_oracle_sql",
    "bpe_train_merges",
    "bpe_tokenized_words",
    "bpe_merges_oracle_sql",
    "bpe_tokenize_oracle_sql",
    "word_frequencies",
    "doc_word_rows",
]
