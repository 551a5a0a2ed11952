"""Scalar expression library (all built-in Catalyst expressions, no UDFs)."""

from label_maker_dask_spark.functions.pixel import (
    clamp,
    pixel_bbox_cols,
    pixel_convert,
)
from label_maker_dask_spark.functions.timeutil import epoch_micros

__all__ = ["clamp", "epoch_micros", "pixel_bbox_cols", "pixel_convert"]
