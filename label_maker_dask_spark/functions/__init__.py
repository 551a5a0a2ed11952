"""Scalar expression library (all built-in Catalyst expressions, no UDFs)."""

from label_maker_dask_spark.functions.pixel import (
    clamp,
    pixel_bbox_cols,
    pixel_convert,
)

__all__ = ["clamp", "pixel_bbox_cols", "pixel_convert"]
