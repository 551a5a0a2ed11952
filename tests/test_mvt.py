"""MVT decoder golden tests: tiles are hand-encoded here with an
independent minimal protobuf writer, then decoded by sources/mvt.py.
Covers varint/zigzag wire primitives, packed geometry command integers,
point/line/polygon assembly, property tag resolution, extent handling,
the default y-flip, and the error-tolerant fetcher contract."""

from __future__ import annotations

import json
import struct

from label_maker_dask_spark.sources import mvt
from label_maker_dask_spark.sources.vector_tiles import decoding_tile_fetcher


# --- minimal protobuf writer (test-side, independent of the decoder) ---------


def vint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def zz(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def tag(field: int, wire: int) -> bytes:
    return vint(field << 3 | wire)


def ld(field: int, payload: bytes) -> bytes:
    return tag(field, 2) + vint(len(payload)) + payload


def vf(field: int, n: int) -> bytes:
    return tag(field, 0) + vint(n)


def packed(field: int, ints) -> bytes:
    return ld(field, b"".join(vint(i) for i in ints))


def cmd(cid: int, count: int) -> int:
    return cid | (count << 3)


def value_str(s: str) -> bytes:
    return ld(1, s.encode())


def value_int(n: int) -> bytes:
    return tag(4, 0) + vint(n)


def value_double(d: float) -> bytes:
    return tag(3, 1) + struct.pack("<d", d)


def build_tile() -> bytes:
    # keys/values shared across the layer
    keys = [ld(3, b"building"), ld(3, b"height")]
    values = [ld(4, value_str("yes")), ld(4, value_int(10)),
              ld(4, value_double(2.5))]

    # polygon: exterior ring (2,2)->(10,2)->(10,10)->(2,10), positive
    # surveyor area in raw (y-down) tile coords => shell
    poly_geom = [
        cmd(1, 1), zz(2), zz(2),
        cmd(2, 3), zz(8), zz(0), zz(0), zz(8), zz(-8), zz(0),
        cmd(7, 0) | cmd(7, 1) * 0,  # ClosePath (count ignored)
    ]
    poly = ld(2, vf(1, 7) + packed(2, [0, 0]) + vf(3, 3) + packed(4, poly_geom))

    # point at (100, 200), tags height=10, height2=2.5
    pt_geom = [cmd(1, 1), zz(100), zz(200)]
    pt = ld(2, vf(1, 9) + packed(2, [1, 1]) + vf(3, 1) + packed(4, pt_geom))

    # linestring (0,0)->(5,5)->(5,0), no tags, no explicit id
    ln_geom = [cmd(1, 1), zz(0), zz(0), cmd(2, 2), zz(5), zz(5), zz(0), zz(-5)]
    ln = ld(2, vf(3, 2) + packed(4, ln_geom))

    layer = (
        vf(15, 2)  # version
        + ld(1, b"osm")
        + poly + pt + ln
        + b"".join(keys)
        + b"".join(values)
        + vf(5, 4096)  # extent
    )
    return ld(3, layer)


def test_decode_layers_and_properties():
    decoded = mvt.decode(build_tile())
    assert set(decoded) == {"osm"}
    layer = decoded["osm"]
    assert layer["extent"] == 4096
    assert len(layer["features"]) == 3
    poly, pt, ln = layer["features"]
    assert poly["id"] == 7 and poly["properties"] == {"building": "yes"}
    assert pt["id"] == 9 and pt["properties"] == {"height": 10}
    assert ln["properties"] == {}


def test_decode_geometries_default_y_up():
    decoded = mvt.decode(build_tile())
    poly, pt, ln = decoded["osm"]["features"]
    assert pt["geometry"] == {"type": "Point", "coordinates": [100, 4096 - 200]}
    assert ln["geometry"]["type"] == "LineString"
    assert ln["geometry"]["coordinates"] == [
        [0, 4096], [5, 4096 - 5], [5, 4096]
    ]
    g = poly["geometry"]
    assert g["type"] == "Polygon"
    ring = g["coordinates"][0]
    assert ring[0] == ring[-1]  # closed
    assert sorted(map(tuple, ring[:-1])) == [
        (2, 4086), (2, 4094), (10, 4086), (10, 4094)
    ]


def test_decode_y_down_matches_raw_coordinates():
    decoded = mvt.decode(build_tile(), y_coord_down=True)
    pt = decoded["osm"]["features"][1]
    assert pt["geometry"]["coordinates"] == [100, 200]


def test_polygon_with_hole_groups_rings():
    # shell (0,0)->(20,0)->(20,20)->(0,20): positive raw area;
    # hole (5,5)->(5,10)->(10,10)->(10,5): negative raw area
    shell = [cmd(1, 1), zz(0), zz(0),
             cmd(2, 3), zz(20), zz(0), zz(0), zz(20), zz(-20), zz(0),
             cmd(7, 0)]
    hole = [cmd(1, 1), zz(5), zz(-15),
            cmd(2, 3), zz(0), zz(5), zz(5), zz(0), zz(0), zz(-5),
            cmd(7, 0)]
    feat = ld(2, vf(3, 3) + packed(4, shell + hole))
    layer = vf(15, 2) + ld(1, b"osm") + feat + vf(5, 4096)
    g = mvt.decode(ld(3, layer))["osm"]["features"][0]["geometry"]
    assert g["type"] == "Polygon"
    assert len(g["coordinates"]) == 2  # shell + hole in one polygon


def test_decoding_tile_fetcher_feature_rows_and_error_tolerance():
    tiles = {(15, 1, 2): build_tile(), (15, 3, 3): b"\xff garbage \x00"}

    def get_bytes(z, x, y):
        return tiles[(z, x, y)]  # KeyError for unknown tiles

    fetch = decoding_tile_fetcher(get_bytes)
    feats = fetch(15, 1, 2)
    assert len(feats) == 3
    assert feats[0]["geometry_type"] == "Polygon"
    assert json.loads(feats[0]["geometry"])["type"] == "Polygon"
    assert feats[0]["properties"] == {"building": "yes"}
    assert feats[1]["properties"] == {"height": "10"}
    # bad bytes and missing tiles both yield the empty feature set
    assert fetch(15, 3, 3) == []
    assert fetch(15, 9, 9) == []


def test_unclosed_ring_keeps_sign_alignment():
    # shell1 is malformed (no ClosePath) and gets flushed by the next
    # MoveTo; its sign must still be recorded so shell2 keeps its hole
    shell1 = [cmd(1, 1), zz(0), zz(0),
              cmd(2, 3), zz(20), zz(0), zz(0), zz(20), zz(-20), zz(0)]
    shell2 = [cmd(1, 1), zz(100), zz(80),
              cmd(2, 3), zz(20), zz(0), zz(0), zz(20), zz(-20), zz(0),
              cmd(7, 0)]
    hole2 = [cmd(1, 1), zz(5), zz(-15),
             cmd(2, 3), zz(0), zz(5), zz(5), zz(0), zz(0), zz(-5),
             cmd(7, 0)]
    feat = ld(2, vf(3, 3) + packed(4, shell1 + shell2 + hole2))
    layer = vf(15, 2) + ld(1, b"osm") + feat + vf(5, 4096)
    g = mvt.decode(ld(3, layer))["osm"]["features"][0]["geometry"]
    assert g["type"] == "MultiPolygon"
    assert len(g["coordinates"]) == 2
    assert len(g["coordinates"][0]) == 1  # open shell stands alone
    assert len(g["coordinates"][1]) == 2  # shell2 keeps its hole


# --- engine writer (sources/mvt_write) round-trips through the decoder ------


def test_engine_writer_roundtrip_all_geometries():
    """encode_mvt output decodes through sources/mvt.py with identical
    ids, typed properties, and geometries (raw y-down equality and the
    default y-up flip), across every supported geometry family."""
    from label_maker_dask_spark.sources.mvt_write import encode_mvt

    feats = [
        {"id": 7, "geometry": {"type": "Point", "coordinates": [100, 200]},
         "properties": {"k": 12, "name": "alpha", "neg": -5,
                        "f": 2.5, "b": True}},
        {"id": 8, "geometry": {"type": "LineString",
                               "coordinates": [[0, 0], [5, 5], [5, 0]]},
         "properties": {"k": 12}},
        {"id": 9, "geometry": {"type": "Polygon",
                               "coordinates": [[[2, 2], [10, 2], [10, 10],
                                                [2, 10], [2, 2]]]},
         "properties": {"name": "alpha"}},
        {"geometry": {"type": "MultiPoint",
                      "coordinates": [[1, 2], [3, 4]]}, "properties": {}},
        {"id": 11, "geometry": {"type": "MultiLineString",
                                "coordinates": [[[0, 0], [1, 1]],
                                                [[2, 2], [3, 3]]]},
         "properties": {}},
    ]
    raw = mvt.decode(encode_mvt({"osm": feats}), y_coord_down=True)["osm"]
    assert raw["extent"] == 4096 and len(raw["features"]) == 5
    p0, p1, p2, p3, p4 = raw["features"]
    assert p0["id"] == 7 and p0["properties"] == {
        "k": 12, "name": "alpha", "neg": -5, "f": 2.5, "b": True}
    assert p0["geometry"] == {"type": "Point", "coordinates": [100, 200]}
    assert p1["geometry"]["coordinates"] == [[0, 0], [5, 5], [5, 0]]
    ring = p2["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1] and len(ring) == 5  # ClosePath re-closes
    assert ring[:-1] == [[2, 2], [10, 2], [10, 10], [2, 10]]
    assert p3["geometry"] == {"type": "MultiPoint",
                              "coordinates": [[1, 2], [3, 4]]}
    assert p4["geometry"]["coordinates"] == [[[0, 0], [1, 1]],
                                             [[2, 2], [3, 3]]]
    # value dedup: "alpha" and 12 each stored once in the layer tables
    flipped = mvt.decode(encode_mvt({"osm": feats}))["osm"]["features"][0]
    assert flipped["geometry"]["coordinates"] == [100, 4096 - 200]


def test_engine_writer_value_table_dedup():
    from label_maker_dask_spark.sources.mvt_write import encode_mvt

    feats = [
        {"id": i, "geometry": {"type": "Point", "coordinates": [i, i]},
         "properties": {"k": 5, "s": "same"}}
        for i in range(40)
    ]
    buf = encode_mvt({"osm": feats})
    # 40 features sharing 2 keys + 2 values: the layer must stay small
    # (dedup tables), far under the no-dedup 40*(2 keys + 2 values) size
    assert len(buf) < 1200
    decoded = mvt.decode(buf)["osm"]["features"]
    assert all(f["properties"] == {"k": 5, "s": "same"} for f in decoded)
