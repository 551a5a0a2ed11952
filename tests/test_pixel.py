"""Pixel-math golden vectors — the reference's non-standard conventions
(4096->255 scale, HALF_EVEN rounding, y-flip, ±4 pad, clamp;
reference label.py:68-96)."""

from pyspark.sql import functions as F

from label_maker_dask_spark.functions.pixel import clamp, pixel_bbox_cols, pixel_convert


def _ref_pixel(b, flip):
    px = round(b * 255.0 / 4096)  # Python round = HALF_EVEN, like reference
    return 255 - px if flip else px


def test_pixel_convert_full_parity(spark):
    """Exhaustive 0..4096 parity with Python's round (incl. banker's ties)."""
    df = spark.range(4097).select(
        F.col("id"),
        pixel_convert(F.col("id")).alias("px"),
        pixel_convert(F.col("id"), flip=True).alias("px_flip"),
    )
    for r in df.collect():
        assert r.px == _ref_pixel(r.id, False), r.id
        assert r.px_flip == _ref_pixel(r.id, True), r.id


def test_clamp(spark):
    rows = spark.range(1).select(
        clamp(F.lit(-5)).alias("a"), clamp(F.lit(300)).alias("b"),
        clamp(F.lit(100)).alias("c"),
    ).first()
    assert (rows.a, rows.b, rows.c) == (0, 255, 100)


def test_pixel_bbox_golden(spark):
    """bounds (1000, 1000, 3000, 2000) -> [58, 126, 191, 197]
    (hand-computed from label.py:166-194: px(1000)=62, px(2000)=125,
    px(3000)=187; y-flip then ±4 pad)."""
    cols = pixel_bbox_cols(F.lit(1000), F.lit(1000), F.lit(3000), F.lit(2000))
    row = spark.range(1).select(*[c.alias(f"v{i}") for i, c in enumerate(cols)]).first()
    assert [row.v0, row.v1, row.v2, row.v3] == [58, 126, 191, 197]


def test_pixel_bbox_clamps_at_edges(spark):
    cols = pixel_bbox_cols(F.lit(0), F.lit(0), F.lit(4096), F.lit(4096))
    row = spark.range(1).select(*[c.alias(f"v{i}") for i, c in enumerate(cols)]).first()
    assert [row.v0, row.v1, row.v2, row.v3] == [0, 0, 255, 255]
