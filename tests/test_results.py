"""Result wrappers, class_match predicates, class colors, PNG encoding
(SURVEY §2 A14/A18/A19/A20; reference result.py / utils.py:32-40,131-138)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from label_maker_dask_spark.results import (
    ClassificationResult,
    ObjectDetectionResult,
    SegmentationResult,
    class_color,
    class_match,
    png_data_uri,
    wrap_results,
    _png_bytes,
)

CLASSES = [{"name": "roads", "filter": []}, {"name": "buildings", "filter": []}]


def test_png_bytes_are_valid_png():
    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    arr[:, :, 0] = 255
    png = _png_bytes(arr)
    assert png.startswith(b"\x89PNG\r\n\x1a\n")
    # IHDR dimensions round-trip
    assert struct.unpack(">II", png[16:24]) == (8, 8)
    # decode the IDAT scanlines back: filter byte 0 + RGB rows
    idat_len = struct.unpack(">I", png[33:37])[0]
    raw = zlib.decompress(png[41:41 + idat_len])
    assert len(raw) == 8 * (1 + 8 * 3)
    assert raw[1:4] == b"\xff\x00\x00"


def test_class_color_cycles_and_background():
    assert class_color(0) == (0, 0, 0)
    assert class_color(1) == class_color(7)  # 6-color cycle
    assert class_color(1) != class_color(2)


def test_class_match_classification(spark):
    df = spark.createDataFrame(
        [(1, [0, 1, 0]), (2, [1, 0, 0])], "tile long, label array<int>"
    )
    got = {
        r.tile
        for r in df.where(class_match("classification", 1)).collect()
    }
    assert got == {1}
    # background slot (i=0) matches the empty tile
    got0 = {
        r.tile for r in df.where(class_match("classification", 0)).collect()
    }
    assert got0 == {2}


def test_class_match_detection(spark):
    df = spark.createDataFrame(
        [
            (1, [{"xmin": 0, "ymin": 0, "xmax": 5, "ymax": 5, "class": 2}]),
            (2, []),
        ],
        "tile long, label array<struct<xmin:int,ymin:int,xmax:int,ymax:int,class:int>>",
    )
    got = {r.tile for r in df.where(class_match("object-detection", 2)).collect()}
    assert got == {1}


def test_class_match_segmentation(spark):
    raster_with_2 = bytes([0] * 100 + [2] + [0] * 155)
    raster_empty = bytes(256)
    df = spark.createDataFrame(
        [(1, raster_with_2), (2, raster_empty)], "tile long, label binary"
    )
    got = {r.tile for r in df.where(class_match("segmentation", 2)).collect()}
    assert got == {1}


def test_result_cards_render():
    img = np.full((256, 256, 3), 128, dtype=np.uint8).tobytes()
    c = ClassificationResult((15, 3, 7), [0, 1, 0], CLASSES, img)
    html = c._repr_html_()
    assert "roads" in html and "data:image/png;base64," in html

    d = ObjectDetectionResult(
        (15, 3, 7),
        [{"xmin": 10, "ymin": 20, "xmax": 50, "ymax": 60, "class": 1}],
        CLASSES,
    )
    html = d._repr_html_()
    assert "<svg" in html and "rect" in html and "1 boxes" in html

    raster = np.zeros((256, 256), dtype=np.uint8)
    raster[10:20, 10:20] = 1
    s = SegmentationResult((15, 3, 7), raster.tobytes(), CLASSES)
    assert "data:image/png;base64," in s._repr_html_()


def test_wrap_results_dispatch(spark):
    df = spark.createDataFrame(
        [(15, 3, 7, [1, 0, 0])], "z long, x long, y long, label array<int>"
    )
    results = wrap_results(df.collect(), "classification", CLASSES)
    assert len(results) == 1
    assert isinstance(results[0], ClassificationResult)
    assert results[0].tile == (15, 3, 7)
    with pytest.raises(KeyError):
        wrap_results([], "no-such-type", CLASSES)


def test_image_array_gray_alpha_drops_alpha_and_encodes():
    from label_maker_dask_spark.multimodal.png import decode_png
    from label_maker_dask_spark.results import _image_array

    img = np.zeros((4, 4, 2), dtype=np.uint8)
    img[:, :, 0] = 7    # gray plane
    img[:, :, 1] = 255  # alpha plane must NOT leak into RGB
    arr = _image_array(img.tobytes(), 4, 4, 2)
    assert arr.shape == (4, 4, 3)
    assert (arr == 7).all()
    rt = decode_png(_png_bytes(arr))  # encoder accepts the spread array
    assert (rt[:, :, :3] == 7).all()
