"""Dependency-free Mapbox Vector Tile (MVT) decoder.

Implements the public MVT 2.1 spec (protobuf wire format + command-integer
geometry encoding) in pure Python, so the vector-tile scan
(``sources/vector_tiles.py``, reference main.py:37-44) needs no external
protobuf/mvt package.  Output matches the shape the reference consumes from
``mapbox_vector_tile.decode`` (label.py:13): per layer, feature dicts with
``geometry`` (GeoJSON-style, y flipped to point up within the tile extent —
the library's default the reference was written against), ``properties``,
and ``id``.

Wire format summary (vector_tile.proto):

- Tile:    layers = field 3 (length-delimited)
- Layer:   version=15, name=1, features=2, keys=3, values=4, extent=5
- Feature: id=1, tags=2 (packed), type=3 (1 point / 2 line / 3 polygon),
           geometry=4 (packed command integers)
- Value:   string=1, float=2, double=3, int=4, uint=5, sint=6, bool=7
- Geometry: command integer ``(id & 0x7) | (count << 3)``; id 1 MoveTo,
  2 LineTo, 7 ClosePath; parameters are zigzag-encoded deltas.
"""

from __future__ import annotations

import struct
from typing import Iterator, Tuple

__all__ = ["decode"]


# --- protobuf primitives -----------------------------------------------------


def _varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a protobuf message."""
    pos = 0
    while pos < len(buf):
        key, pos = _varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if wire == 0:  # varint
            val, pos = _varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _varint(buf, pos)
            val = buf[pos:pos + ln]
            if len(val) < ln:
                raise ValueError("truncated length-delimited field")
            pos += ln
        elif wire == 5:  # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _packed_varints(buf: bytes) -> list[int]:
    out, pos = [], 0
    while pos < len(buf):
        v, pos = _varint(buf, pos)
        out.append(v)
    return out


# --- MVT structures ----------------------------------------------------------


def _decode_value(buf: bytes):
    for field, _wire, val in _fields(buf):
        if field == 1:
            return val.decode("utf-8")
        if field == 2:
            return struct.unpack("<f", val)[0]
        if field == 3:
            return struct.unpack("<d", val)[0]
        if field == 4:
            return _to_signed(val)
        if field == 5:
            return val
        if field == 6:
            return _zigzag(val)
        if field == 7:
            return bool(val)
    return None


def _to_signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


_GEOM_TYPES = {1: "Point", 2: "LineString", 3: "Polygon"}


def _ring_area2(ring: list[list[int]]) -> int:
    """Twice the signed area (surveyor's formula) in raw tile coords."""
    a = 0
    for (x0, y0), (x1, y1) in zip(ring, ring[1:] + ring[:1]):
        a += x0 * y1 - x1 * y0
    return a


def _decode_geometry(gtype: int, commands: list[int], extent: int, flip_y: bool):
    """Command integers -> GeoJSON-style geometry dict."""
    parts: list[list[list[int]]] = []
    ring_signs: list[int] = []
    cur: list[list[int]] = []
    x = y = 0
    i = 0
    n = len(commands)

    def _flush_open(ring: list[list[int]]) -> None:
        # a ring flushed without ClosePath is malformed per the MVT spec;
        # still record its sign so parts and ring_signs stay aligned for
        # any rings that follow
        if gtype == 3:
            raw = [[px, extent - py] for px, py in ring] if flip_y else ring
            ring_signs.append(1 if _ring_area2(raw) > 0 else -1)
        parts.append(ring)

    while i < n:
        cmd = commands[i]
        i += 1
        cid, count = cmd & 0x7, cmd >> 3
        if cid in (1, 2):  # MoveTo / LineTo
            if cid == 1 and cur:
                _flush_open(cur)
                cur = []
            for _ in range(count):
                x += _zigzag(commands[i])
                y += _zigzag(commands[i + 1])
                i += 2
                cur.append([x, (extent - y) if flip_y else y])
        elif cid == 7:  # ClosePath (polygons)
            if cur:
                # signed area in RAW coords decides shell vs hole, before
                # any y flip (the flip negates orientation)
                raw = [[px, extent - py] for px, py in cur] if flip_y else cur
                ring_signs.append(1 if _ring_area2(raw) > 0 else -1)
                cur.append(list(cur[0]))
                parts.append(cur)
                cur = []
        else:
            raise ValueError(f"unknown geometry command {cid}")
    if cur:
        _flush_open(cur)

    if gtype == 1:  # Point / MultiPoint
        pts = [p for part in parts for p in part]
        if len(pts) == 1:
            return {"type": "Point", "coordinates": pts[0]}
        return {"type": "MultiPoint", "coordinates": pts}
    if gtype == 2:  # LineString / MultiLineString
        if len(parts) == 1:
            return {"type": "LineString", "coordinates": parts[0]}
        return {"type": "MultiLineString", "coordinates": parts}
    if gtype == 3:  # Polygon / MultiPolygon (shell = positive area)
        polys: list[list[list[list[int]]]] = []
        for ring, sign in zip(parts, ring_signs or [1] * len(parts)):
            if sign > 0 or not polys:
                polys.append([ring])
            else:
                polys[-1].append(ring)
        if len(polys) == 1:
            return {"type": "Polygon", "coordinates": polys[0]}
        return {"type": "MultiPolygon", "coordinates": polys}
    raise ValueError(f"unknown geometry type {gtype}")


def _decode_feature(buf: bytes, keys: list[str], values: list, extent: int,
                    flip_y: bool, default_id: int) -> dict:
    fid = default_id
    tags: list[int] = []
    gtype = 0
    commands: list[int] = []
    for field, wire, val in _fields(buf):
        if field == 1:
            fid = val
        elif field == 2:
            tags = _packed_varints(val) if wire == 2 else tags + [val]
        elif field == 3:
            gtype = val
        elif field == 4:
            commands = _packed_varints(val) if wire == 2 else commands + [val]
    props = {}
    for k_i, v_i in zip(tags[0::2], tags[1::2]):
        if k_i < len(keys) and v_i < len(values):
            props[keys[k_i]] = values[v_i]
    return {
        "id": fid,
        "type": gtype,
        "geometry": _decode_geometry(gtype, commands, extent, flip_y),
        "properties": props,
    }


def _decode_layer(buf: bytes, flip_y: bool) -> Tuple[str, dict]:
    name = ""
    extent = 4096
    feature_bufs: list[bytes] = []
    keys: list[str] = []
    values: list = []
    for field, _wire, val in _fields(buf):
        if field == 1:
            name = val.decode("utf-8")
        elif field == 2:
            feature_bufs.append(val)
        elif field == 3:
            keys.append(val.decode("utf-8"))
        elif field == 4:
            values.append(_decode_value(val))
        elif field == 5:
            extent = val
    features = [
        _decode_feature(fb, keys, values, extent, flip_y, i)
        for i, fb in enumerate(feature_bufs)
    ]
    return name, {"extent": extent, "features": features}


def decode(buf: bytes, y_coord_down: bool = False) -> dict:
    """Decode an MVT tile to ``{layer_name: {"extent": ..., "features":
    [...]}}`` — the same shape (and default y-up orientation) the reference
    reads from ``mapbox_vector_tile.decode`` at label.py:13."""
    layers = {}
    for field, _wire, val in _fields(bytes(buf)):
        if field == 3:
            name, layer = _decode_layer(val, flip_y=not y_coord_down)
            layers[name] = layer
    return layers
