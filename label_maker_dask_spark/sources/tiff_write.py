"""GeoTIFF writer (the sink twin of ``sources/tiff.py``'s reader).

From-scratch baseline-TIFF encoder for 8-bit rasters: striped or
internally-tiled layout, uncompressed or deflate, optional horizontal-
differencing predictor, EPSG:4326 or EPSG:3857 georeferencing via the
ModelPixelScale/ModelTiepoint/GeoKey tags.  The tiled+deflate+predictor
combination is the cloud-optimized (COG) interior shape the windowed
reader prunes by tile column.

Reference parity note: the reference never writes imagery (it consumes
TMS/WMS/COG via rio-tiler, utils.py:52-100); this sink exists so the
engine can materialize raster fixtures and tile mosaics without a GDAL
dependency, and so the reader's windowed path can be gated end-to-end
against engine-written bytes (catalog entry ``raster_cog_window_
channel_sums``).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TYPE_FMT = {3: "H", 4: "I", 12: "d"}


def write_geotiff(
    arr: np.ndarray,
    bounds,
    compression: int = 1,
    predictor: int = 1,
    tiled: bool = False,
    tile_size: int = 256,
    rows_per_strip: int = 64,
    epsg: int = 4326,
) -> bytes:
    """Encode ``arr`` (H, W, C) uint8 as a georeferenced baseline TIFF.

    ``bounds`` = (west, south, east, north) in the CRS's units; pixel
    scale is derived as (extent / pixels) with the origin at the
    top-left corner.  ``compression``: 1 = none, 8 = deflate.
    ``predictor``: 1 = none, 2 = horizontal differencing (per block
    row, per channel — the standard TIFF predictor).  ``tiled`` selects
    the internal-tile layout (``tile_size`` square, multiples of 16 per
    the TIFF spec) instead of strips.
    """
    if arr.dtype != np.uint8 or arr.ndim != 3:
        raise ValueError("write_geotiff wants (H, W, C) uint8")
    if compression not in (1, 8):
        raise ValueError(f"unsupported compression {compression} (1 or 8)")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor} (1 or 2)")
    if tiled and tile_size % 16 != 0:
        raise ValueError("TIFF tile size must be a multiple of 16")
    h, w, spp = arr.shape
    west, south, east, north = (float(v) for v in bounds)
    sx = (east - west) / w
    sy = (north - south) / h

    def encode(block: np.ndarray) -> bytes:
        if predictor == 2:
            b16 = block.astype(np.int16)
            block = np.concatenate(
                [b16[:, :1, :], b16[:, 1:, :] - b16[:, :-1, :]], axis=1
            ).astype(np.uint8)
        raw = block.tobytes()
        return zlib.compress(raw) if compression == 8 else raw

    chunks = []
    if tiled:
        t = tile_size
        for trow in range((h + t - 1) // t):
            for tcol in range((w + t - 1) // t):
                block = np.zeros((t, t, spp), dtype=np.uint8)
                src = arr[trow * t : (trow + 1) * t, tcol * t : (tcol + 1) * t]
                block[: src.shape[0], : src.shape[1]] = src
                chunks.append(encode(block))
    else:
        rps = rows_per_strip
        for s in range((h + rps - 1) // rps):
            chunks.append(encode(arr[s * rps : (s + 1) * rps]))

    body = b"".join(chunks)
    offsets, counts, pos = [], [], 8
    for c in chunks:
        offsets.append(pos)
        counts.append(len(c))
        pos += len(c)

    entries = [
        (256, 4, 1, [w]),
        (257, 4, 1, [h]),
        (258, 3, spp, [8] * spp),
        (259, 3, 1, [compression]),
        (262, 3, 1, [2 if spp >= 3 else 1]),
        (277, 3, 1, [spp]),
        (284, 3, 1, [1]),  # chunky (interleaved) planar config
        (33550, 12, 3, [sx, sy, 0.0]),
        (33922, 12, 6, [0.0, 0.0, 0.0, west, north, 0.0]),
        (
            34735,
            3,
            8,
            # GTModelType geokey (1025=?) minimal directory: version,
            # revision, minor, count, then one key: geographic (2048)
            # or projected (3072) CRS id
            [1, 1, 0, 1, 2048 if epsg == 4326 else 3072, 0, 1, epsg],
        ),
    ]
    if tiled:
        entries += [
            (322, 3, 1, [tile_size]),
            (323, 3, 1, [tile_size]),
            (324, 4, len(offsets), offsets),
            (325, 4, len(counts), counts),
        ]
    else:
        entries += [
            (273, 4, len(offsets), offsets),
            (278, 3, 1, [rows_per_strip]),
            (279, 4, len(counts), counts),
        ]
    if predictor != 1:
        entries.append((317, 3, 1, [predictor]))
    entries.sort()

    ifd_off = 8 + len(body)
    n = len(entries)
    ext_off = ifd_off + 2 + n * 12 + 4
    ifd = struct.pack("<H", n)
    ext = b""
    for tag, typ, count, values in entries:
        payload = struct.pack("<" + _TYPE_FMT[typ] * count, *values)
        if len(payload) <= 4:
            ifd += struct.pack("<HHI", tag, typ, count) + payload.ljust(
                4, b"\x00"
            )
        else:
            ifd += struct.pack("<HHII", tag, typ, count, ext_off + len(ext))
            ext += payload
    ifd += struct.pack("<I", 0)  # no next IFD

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off) + body + ifd + ext)
    return bytes(out)


__all__ = ["write_geotiff"]
