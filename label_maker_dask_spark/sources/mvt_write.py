"""Mapbox Vector Tile writer (the sink twin of ``sources/mvt.py``).

From-scratch protobuf wire encoding of the MVT 2.1 layout — varint /
zigzag primitives, packed geometry command integers, per-layer key and
value dedup tables — with Point/MultiPoint, LineString/MultiLineString
and Polygon/MultiPolygon assembly.  Coordinates are RAW tile coords
(y-down integers, like the wire format); the decoder's default y-flip
is the reader-side convention.

Reference parity note: the reference never writes vector tiles (it
decodes them via mapbox_vector_tile, main.py:41); this sink exists so
the engine can materialize tile fixtures and round-trip-gate the
decoder against engine-written bytes (catalog entry
``mvt_roundtrip_feature_stats``) without a protobuf dependency.
"""

from __future__ import annotations

import struct
from typing import Iterable

_GEOM_TYPE = {
    "Point": 1,
    "MultiPoint": 1,
    "LineString": 2,
    "MultiLineString": 2,
    "Polygon": 3,
    "MultiPolygon": 3,
}


def _varint(n: int) -> bytes:
    if n < 0:
        raise ValueError("varint wants a non-negative int")
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _tag(field: int, wire: int) -> bytes:
    return _varint(field << 3 | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _vf(field: int, n: int) -> bytes:
    return _tag(field, 0) + _varint(n)


def _packed(field: int, ints: Iterable[int]) -> bytes:
    return _ld(field, b"".join(_varint(i) for i in ints))


def _cmd(cid: int, count: int) -> int:
    return cid | (count << 3)


def _value(v) -> bytes:
    # MVT Value message: 1=string, 3=double, 4=int64, 7=bool
    if isinstance(v, bool):
        return _tag(7, 0) + _varint(1 if v else 0)
    if isinstance(v, str):
        return _ld(1, v.encode())
    if isinstance(v, int):
        if v >= 0:
            return _tag(4, 0) + _varint(v)  # int64
        return _tag(6, 0) + _varint(_zigzag(v))  # sint64 (zigzag)
    if isinstance(v, float):
        return _tag(3, 1) + struct.pack("<d", v)
    raise TypeError(f"unsupported property value type {type(v).__name__}")


def _parts(geom: dict) -> list[list[list[int]]]:
    """Normalize any supported geometry to a list of coordinate parts
    (each a list of [x, y]); polygon rings drop an explicit closing
    duplicate (ClosePath re-adds it on decode)."""
    t, c = geom["type"], geom["coordinates"]
    if t == "Point":
        return [[c]]
    if t == "MultiPoint":
        return [c]
    if t == "LineString":
        return [c]
    if t == "MultiLineString":
        return list(c)
    rings = c if t == "Polygon" else [r for poly in c for r in poly]
    out = []
    for r in rings:
        r = list(r)
        if len(r) > 1 and r[0] == r[-1]:
            r = r[:-1]
        out.append(r)
    return out


def _encode_geometry(geom: dict) -> list[int]:
    gtype = _GEOM_TYPE[geom["type"]]
    parts = _parts(geom)
    cmds: list[int] = []
    x = y = 0

    def move(pts):
        nonlocal x, y
        for px, py in pts:
            cmds.append(_zigzag(int(px) - x))
            cmds.append(_zigzag(int(py) - y))
            x, y = int(px), int(py)

    if gtype == 1:
        pts = [p for part in parts for p in part]
        cmds.append(_cmd(1, len(pts)))
        move(pts)
        return cmds
    for part in parts:
        if len(part) < 2:
            raise ValueError("line/ring part needs >= 2 points")
        cmds.append(_cmd(1, 1))
        move(part[:1])
        cmds.append(_cmd(2, len(part) - 1))
        move(part[1:])
        if gtype == 3:
            cmds.append(_cmd(7, 1))
    return cmds


def encode_mvt(layers: dict, extent: int = 4096) -> bytes:
    """Encode ``{layer_name: [feature, ...]}`` as MVT bytes.

    Each feature is ``{"id": int?, "geometry": {"type", "coordinates"},
    "properties": {str: str|int|float|bool}}`` with integer tile
    coordinates in [0, extent).  Keys and values dedup into the layer
    tables in first-seen order (properties iterate in dict order, so
    byte output is deterministic for deterministic inputs)."""
    tile = b""
    for name, feats in layers.items():
        keys: list[str] = []
        vals: list[bytes] = []
        kidx: dict = {}
        vidx: dict = {}
        fbufs = []
        for f in feats:
            tags: list[int] = []
            for k, v in (f.get("properties") or {}).items():
                if k not in kidx:
                    kidx[k] = len(keys)
                    keys.append(k)
                venc = _value(v)
                vkey = (type(v).__name__, venc)
                if vkey not in vidx:
                    vidx[vkey] = len(vals)
                    vals.append(venc)
                tags += [kidx[k], vidx[vkey]]
            body = b""
            if f.get("id") is not None:
                body += _vf(1, int(f["id"]))
            if tags:
                body += _packed(2, tags)
            geom = f["geometry"]
            body += _vf(3, _GEOM_TYPE[geom["type"]])
            body += _packed(4, _encode_geometry(geom))
            fbufs.append(_ld(2, body))
        layer = (
            _vf(15, 2)
            + _ld(1, name.encode())
            + b"".join(fbufs)
            + b"".join(_ld(3, k.encode()) for k in keys)
            + b"".join(_ld(4, v) for v in vals)
            + _vf(5, extent)
        )
        tile += _ld(3, layer)
    return tile


__all__ = ["encode_mvt"]
