"""Dependency-free PNG codec (stdlib zlib + numpy).

Decodes 8-bit non-interlaced PNGs (grayscale / gray+alpha / RGB / RGBA,
all five scanline filters) so the multimodal decode stage and the TMS
tile reader work on real PNG bytes without an imaging library.
``encode_png`` is the writer twin (filter-0 scanlines — valid, simple,
and deterministic); ``results.py`` renders previews through it, and the
``raster_tms_window_channel_sums`` gate round-trips engine-written PNG
tiles through ``decode_png`` the way the MVT gate round-trips the
protobuf codec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W[, C]) uint8 array -> PNG bytes (8-bit, non-interlaced,
    filter 0 on every scanline).  Channel count picks the color type:
    1 gray, 2 gray+alpha, 3 RGB, 4 RGBA — the exact shapes
    ``decode_png`` accepts, so encode→decode is the identity."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"expected (H, W, 1|2|3|4) uint8, got {arr.shape}")
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    raw = b"".join(b"\x00" + arr[row].tobytes() for row in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        length, tag = struct.unpack(">I4s", data[pos:pos + 8])
        payload = data[pos + 8:pos + 8 + length]
        if len(payload) < length:
            raise ValueError("truncated chunk payload")
        pos += 12 + length  # header + payload + crc
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"only 8-bit PNGs supported, got depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype} (no palette)")
            if interlace != 0:
                raise ValueError("interlaced PNGs not supported")
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")

    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (1 + stride):
        raise ValueError("scanline data size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for row in range(height):
        off = row * (1 + stride)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        out[row] = _unfilter(ftype, line, prior, channels)
        prior = out[row]
    return out.reshape(height, width, channels)


def _unfilter(ftype: int, line: np.ndarray, prior: np.ndarray, bpp: int) -> np.ndarray:
    if ftype == 0:  # None
        return line.copy()
    if ftype == 2:  # Up
        return (line.astype(np.uint16) + prior) .astype(np.uint8)
    if ftype == 1:  # Sub — prefix sum mod 256 with stride bpp
        n = len(line)
        cols = n // bpp
        acc = (
            np.cumsum(line.reshape(cols, bpp), axis=0, dtype=np.uint64) & 0xFF
        ).astype(np.uint8)
        return acc.reshape(n)
    recon = np.empty_like(line)
    if ftype == 3:  # Average (serial in x)
        for i in range(len(line)):
            left = int(recon[i - bpp]) if i >= bpp else 0
            recon[i] = (int(line[i]) + (left + int(prior[i])) // 2) & 0xFF
        return recon
    if ftype == 4:  # Paeth (serial in x)
        for i in range(len(line)):
            a = int(recon[i - bpp]) if i >= bpp else 0
            b = int(prior[i])
            c = int(prior[i - bpp]) if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            if pa <= pb and pa <= pc:
                pred = a
            elif pb <= pc:
                pred = b
            else:
                pred = c
            recon[i] = (int(line[i]) + pred) & 0xFF
        return recon
    raise ValueError(f"unknown PNG filter type {ftype}")
