"""PNG decoder tests: round-trip against the results.py encoder, plus an
independent test-side encoder exercising every scanline filter type."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from label_maker_dask_spark.multimodal.images import decode_compressed
from label_maker_dask_spark.multimodal.png import decode_png
from label_maker_dask_spark.results import _png_bytes


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_with_filters(arr: np.ndarray, filters: list[int]) -> bytes:
    """Test-side PNG encoder applying a chosen filter per scanline,
    computed straight from the spec's filter definitions."""
    h, w, c = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b""
    prior = np.zeros(w * c, dtype=np.int32)
    for row in range(h):
        line = arr[row].reshape(-1).astype(np.int32)
        f = filters[row % len(filters)]
        out = np.empty_like(line)
        for i in range(len(line)):
            a = int(line[i - c]) if i >= c else 0
            b = int(prior[i])
            cc = int(prior[i - c]) if i >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
            out[i] = (int(line[i]) - pred) & 0xFF
        raw += bytes([f]) + out.astype(np.uint8).tobytes()
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


@pytest.fixture()
def rgb():
    rng = np.random.default_rng(3)
    return rng.integers(0, 255, size=(24, 17, 3), dtype=np.uint8)


def test_round_trip_with_results_encoder(rgb):
    np.testing.assert_array_equal(decode_png(_png_bytes(rgb)), rgb)


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_all_filter_types(rgb, filters):
    np.testing.assert_array_equal(
        decode_png(encode_with_filters(rgb, filters)), rgb
    )


@pytest.mark.parametrize("channels,ctype_name", [(1, "gray"), (2, "gray+alpha"), (4, "rgba")])
def test_color_types(channels, ctype_name):
    rng = np.random.default_rng(channels)
    arr = rng.integers(0, 255, size=(9, 11, channels), dtype=np.uint8)
    got = decode_png(encode_with_filters(arr, [4]))
    np.testing.assert_array_equal(got, arr)


def test_decode_compressed_png_path(rgb):
    decode = decode_compressed("png")
    np.testing.assert_array_equal(decode(_png_bytes(rgb)), rgb)


def test_bad_bytes_raise():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4)


def test_encode_png_public_writer_round_trips():
    from label_maker_dask_spark.multimodal.png import decode_png, encode_png

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(10, 13, ch), dtype=np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(arr)), arr)
    # 2-D gray input encodes as color type 0 and decodes to (H, W, 1)
    g = rng.integers(0, 256, size=(6, 5), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(g))[:, :, 0], g)
    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4, 5), dtype=np.uint8))
