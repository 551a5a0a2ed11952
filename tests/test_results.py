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


def test_image_array_decodes_compressed_png():
    """A TMS tile arrives as compressed PNG bytes; rendering must decode
    it rather than reshape the compressed payload (reference decoded at
    fetch time, utils.py:157-163)."""
    from label_maker_dask_spark.multimodal.png import decode_png
    from label_maker_dask_spark.results import _image_array, _png_bytes

    rng = np.random.default_rng(11)
    src = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    blob = _png_bytes(src)
    got = _image_array(blob, 256, 256, 3)
    np.testing.assert_array_equal(got, src)
    # sanity: the compressed blob is NOT reshapeable as a raw buffer
    assert len(blob) != 256 * 256 * 3
    np.testing.assert_array_equal(decode_png(blob), src)


def test_image_array_decodes_compressed_jpeg(spark):
    from label_maker_dask_spark.results import _image_array

    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    yy, xx = np.mgrid[0:256, 0:256]
    src = np.stack(
        [(128 + 60 * np.sin(xx / 11.0)).astype(np.uint8),
         (128 + 60 * np.cos(yy / 13.0)).astype(np.uint8),
         ((xx + yy) % 256).astype(np.uint8)],
        axis=-1,
    )
    bi = jvm.java.awt.image.BufferedImage(
        256, 256, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    px = gw.new_array(jvm.int, 256 * 256)
    a = src.astype(np.int64)
    flat = (a[..., 0] * 65536 + a[..., 1] * 256 + a[..., 2]).ravel()
    for i, v in enumerate(flat):
        px[i] = int(v)
    bi.setRGB(0, 0, 256, 256, px, 0, 256)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
    blob = bytes(baos.toByteArray())

    got = _image_array(blob, 256, 256, 3)
    assert got.shape == (256, 256, 3)
    d = np.abs(got.astype(int) - src.astype(int))
    assert d.mean() <= 4  # lossy codec on a mostly-smooth image

    # and the full render path works on compressed input
    card = ClassificationResult((15, 3, 7), [0, 1, 0], CLASSES, blob)._repr_html_()
    assert card.startswith("<div") and "data:image/png;base64," in card


def test_image_array_raw_buffer_with_codec_magic_stays_raw():
    # a raw uint8 tile whose pixel (0,0) spells the JPEG SOI magic must
    # NOT be routed to the decoder (which would raise on the garbage that
    # follows) — the exact-raw-length check wins
    from label_maker_dask_spark.results import _image_array

    raw = np.zeros((4, 4, 3), dtype=np.uint8)
    raw[0, 0] = (0xFF, 0xD8, 0xFF)
    raw[0, 1] = (0xE0, 0x00, 0x10)
    got = _image_array(raw.tobytes(), 4, 4, 3)
    assert np.array_equal(got, raw)
    # same for the PNG magic
    raw2 = np.zeros((4, 4, 3), dtype=np.uint8)
    raw2.ravel()[:4] = np.frombuffer(b"\x89PNG", dtype=np.uint8)
    got2 = _image_array(raw2.tobytes(), 4, 4, 3)
    assert np.array_equal(got2, raw2)


# --- notebook display-helper parity (reference result.py:27-37,61-78,
# 104-115: show_label / show_image / draw_label) -----------------------------


def test_show_image_returns_renderable_png():
    from label_maker_dask_spark.results import PngImage

    img = np.full((256, 256, 3), 77, dtype=np.uint8).tobytes()
    r = ClassificationResult((15, 3, 7), [0, 1], CLASSES, img)
    shown = r.show_image()
    assert isinstance(shown, PngImage)
    assert shown.array.shape == (256, 256, 3)
    assert (shown.array == 77).all()
    png = shown._repr_png_()
    assert png.startswith(b"\x89PNG\r\n\x1a\n")
    import io

    buf = io.BytesIO()
    shown.save(buf)
    assert buf.getvalue() == png
    with pytest.raises(ValueError):
        shown.save(buf, format="JPEG")


def test_classification_show_label_table():
    r = ClassificationResult((15, 3, 7), [0, 1, 0], CLASSES)
    table = r.show_label()
    assert table.startswith("<table")
    # background row first, then the two classes, ✓ only on roads
    assert table.index("background") < table.index("roads") < table.index(
        "buildings"
    )
    assert "<tr><td>roads</td><td>✓</td></tr>" in table
    assert "<tr><td>buildings</td><td></td></tr>" in table


def test_draw_label_box_outline_parity_with_class_color():
    boxes = [
        {"xmin": 10, "ymin": 20, "xmax": 50, "ymax": 60, "class": 1},
        {"xmin": 100, "ymin": 100, "xmax": 120, "ymax": 140, "class": 2},
    ]
    d = ObjectDetectionResult((15, 3, 7), boxes, CLASSES)
    lab = d.show_label()
    arr = lab.array
    c1, c2 = class_color(1), class_color(2)
    # all four edges carry the class color (inclusive corners, PIL-style)
    assert tuple(arr[20, 10]) == c1 and tuple(arr[60, 50]) == c1
    assert tuple(arr[20, 30]) == c1 and tuple(arr[60, 30]) == c1  # top/bottom
    assert tuple(arr[40, 10]) == c1 and tuple(arr[40, 50]) == c1  # left/right
    assert tuple(arr[100, 110]) == c2 and tuple(arr[140, 120]) == c2
    # interior and exterior untouched (black canvas)
    assert tuple(arr[40, 30]) == (0, 0, 0)
    assert tuple(arr[0, 0]) == (0, 0, 0)


def test_draw_label_clips_out_of_canvas_boxes():
    # PIL parity: edges whose fixed coordinate is off-canvas are NOT
    # relocated onto the border — box (-10,-10,300,5) shows only its
    # bottom edge (y=5), clipped to the visible x span
    d = ObjectDetectionResult(
        (15, 3, 7),
        [{"xmin": -10, "ymin": -10, "xmax": 300, "ymax": 5, "class": 1}],
        CLASSES,
    )
    arr = d.show_label().array
    assert tuple(arr[5, 0]) == class_color(1)
    assert tuple(arr[5, 255]) == class_color(1)
    assert tuple(arr[0, 0]) == (0, 0, 0)  # no phantom top/left edges
    assert tuple(arr[100, 0]) == (0, 0, 0)  # left edge at x=-10 not drawn
    # drawing onto provided imagery mutates and returns the same wrapper
    img = d.show_image()
    out = d.draw_label(img)
    assert out is img


def test_segmentation_show_label_colormap_parity():
    raster = np.zeros((256, 256), dtype=np.uint8)
    raster[10:20, 10:20] = 1
    raster[30:40, 30:40] = 2
    raster[50:60, 50:60] = 9  # beyond the class list: cycles like class_color
    s = SegmentationResult((15, 3, 7), raster.tobytes(), CLASSES)
    arr = s.show_label().array
    assert tuple(arr[15, 15]) == class_color(1)
    assert tuple(arr[35, 35]) == class_color(2)
    assert tuple(arr[55, 55]) == class_color(9)
    assert tuple(arr[0, 0]) == (0, 0, 0)  # background stays black


def test_draw_label_on_decoded_imagery_is_writable():
    # frombuffer-decoded imagery is read-only; PngImage must copy so
    # draw_label can mutate (caught by the round-13 verify drive)
    img = np.full((256, 256, 3), 90, dtype=np.uint8).tobytes()
    d = ObjectDetectionResult(
        (15, 3, 7),
        [{"xmin": 5, "ymin": 5, "xmax": 40, "ymax": 40, "class": 2}],
        CLASSES,
        img,
    )
    drawn = d.draw_label(d.show_image())
    assert tuple(drawn.array[5, 20]) == class_color(2)
    assert tuple(drawn.array[100, 100]) == (90, 90, 90)
