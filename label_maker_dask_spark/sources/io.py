"""Batch IO connectors: Parquet/CSV/JSON scans & sinks plus whole-file
binary reads (SURVEY.md §2.B "Scans/sinks").

Scale posture (100 TB):

- **Schema-explicit reads.** ``inferSchema`` (CSV) / schema sampling (JSON)
  cost a full extra pass over the input before the real scan; every reader
  here takes an explicit ``StructType`` (or reuses a sibling table's
  schema) so the one scan is the only scan.  Parquet carries its own
  schema and needs none.
- **Column pruning & pushdown.** Parquet gets predicate pushdown + column
  pruning from Catalyst for free.  CSV/JSON are row-major text — pruning
  saves parse work but every byte is still read; the connectors exist for
  ingest/egress, and pipelines should land data in Parquet before heavy
  querying (that conversion is :func:`write_table`).
- **Sink layout.** ``partition_by`` produces partition-pruned layouts for
  downstream scans; ``max_records_per_file`` bounds file sizes so a skewed
  final stage can't emit multi-GB files.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with a mandatory explicit schema (no inferSchema pass)."""
    return (
        spark.read.format("csv")
        .schema(schema)
        .option("header", str(header).lower())
        .options(**options)
        .load(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: StructType, **options: str
) -> DataFrame:
    """JSON-lines scan with a mandatory explicit schema (no sampling pass)."""
    return (
        spark.read.format("json").schema(schema).options(**options).load(path)
    )


def read_parquet(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """Parquet scan — self-describing schema, pushdown + pruning native."""
    return spark.read.options(**options).parquet(path)


def read_orc(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """ORC scan — like Parquet a self-describing columnar format with
    min/max statistics, so Catalyst pushdown + column pruning apply
    natively (Spark's vectorized ORC reader)."""
    return spark.read.options(**options).orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: Optional[str] = None,
    recursive: bool = False,
) -> DataFrame:
    """Whole-file binary scan (imagery/audio/video ingest): one row per file
    with ``path, modificationTime, length, content:binary`` — the input edge
    of the multimodal column pipeline (multimodal/images.py).

    Files parallelize per-file; pair with ``pathGlobFilter`` so non-matching
    files are pruned at listing time, never opened."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: Sequence[str] = (),
    max_records_per_file: Optional[int] = None,
    header: bool = True,
    **options: str,
) -> None:
    """Durable sink (the reference's only sink is driver memory,
    main.py:109-111 — distributed writes replace the gather).  Formats:
    parquet (default), orc, csv, json."""
    writer = df.write.format(fmt).mode(mode).options(**options)
    if fmt == "csv":
        writer = writer.option("header", str(header).lower())
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort: bool = True,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table — the storage-layout half of co-located
    joins: two facts bucketed on their join key with the same bucket count
    join with ZERO exchange, and aggregations on the bucket key skip their
    shuffle too (asserted in tests/test_bucketing.py).  At 100 TB this is
    the difference between re-shuffling the fact table per query and
    paying the layout cost once at ingest."""
    writer = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.format(fmt).mode(mode).saveAsTable(name)
