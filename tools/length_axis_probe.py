"""Document-LENGTH axis probe for the text family (round 11).

The sf ladder grows document COUNT with a fixed length distribution,
but BM25 / TF-IDF / BPE / vocab coverage scale with tokens per document
too.  This probe holds doc count constant (sf0.1's 5k docs) and
inflates each text body ×1 / ×4 / ×16 by self-concatenation, then times the
four text entries on each corpus (best-of-2, one warm JVM).

Scratch layout: .scratch/len_x{4,16}/ holds an inflated
documents.parquet plus symlinks to every other sf0.1 table, so the
catalog entries run unchanged.

Usage: PYTHONPATH=/root/repo python tools/length_axis_probe.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
SCRATCH = "/root/repo/.scratch"
QUERIES = [
    "text_tfidf_top_terms",
    "text_bpe_token_counts",
    "text_bm25_top_docs",
    "text_vocab_coverage_top30",
    # round-13 text additions: LM scoring and entropy scale with tokens
    # (and chars) per document, not just document count
    "text_bigram_logprob_interp",
    "text_char_entropy",
    "text_source_kl_divergence",
    # round-14: BPE training/application — length inflation multiplies
    # token MASS x16 while the word-TYPE table stays constant (self-
    # concatenation repeats the same words), so only the one corpus-
    # scale word-count pass may grow; merge rounds are type-bound
    "text_bpe_train_merges",
    "text_bpe_tokenize_corpus",
]
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def build_inflated(spark, factor: int) -> str:
    out = os.path.join(SCRATCH, f"len_x{factor}")
    docs_path = os.path.join(out, "documents.parquet")
    # gate on the write's _SUCCESS marker, not the directory: Spark
    # creates the dir at write START, so a crash mid-write would leave
    # a partial corpus that a bare exists() check never repairs
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        import shutil

        shutil.rmtree(out, ignore_errors=True)  # clear any partial run
        os.makedirs(out, exist_ok=True)
        from pyspark.sql import functions as F

        docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
        body = F.col("text")
        doublings = int(math.log2(factor))
        for _ in range(doublings):
            body = F.concat(body, F.lit(" "), body)
        inflated = docs.withColumn("text", body)
        inflated = inflated.withColumn("n_chars", F.length("text"))
        inflated.write.mode("overwrite").parquet(docs_path)
        for t in TABLES:
            if t == "documents":
                continue
            link = os.path.join(out, f"{t}.parquet")
            if not os.path.exists(link):
                os.symlink(os.path.join(BASE, f"{t}.parquet"), link)
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    import label_maker_dask_spark.queries as Q

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("lmds-length-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "100g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    dirs = [BASE, build_inflated(spark, 4), build_inflated(spark, 16)]

    # warm codegen/Arrow once
    for q in QUERIES:
        Q.QUERIES[q](spark, BASE).write.format("noop").mode("overwrite").save()

    header = f"{'query':30s} {'len x1':>8s} {'len x4':>8s} {'len x16':>8s} {'x(top4x)':>9s} {'exp(len)':>9s}"
    print(header)
    for q in QUERIES:
        cells = []
        for d in dirs:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                Q.QUERIES[q](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            cells.append(best)
        ratio = cells[2] / cells[1] if cells[1] > 0 else float("nan")
        exp = math.log(ratio, 4) if ratio > 0 else float("nan")
        print(
            f"{q:30s} {cells[0]:8.2f} {cells[1]:8.2f} {cells[2]:8.2f}"
            f" {ratio:9.1f} {exp:9.2f}"
        )


if __name__ == "__main__":
    main()
