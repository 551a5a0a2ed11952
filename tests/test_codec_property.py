"""Property tests for the engine's codec SINKS: random inputs must
round-trip bit-exactly through the matching from-scratch readers.

- MVT: random feature sets (every geometry family, typed properties)
  encode via sources/mvt_write and decode via sources/mvt with raw
  (y-down) coordinate equality, id fidelity, and typed property
  fidelity — varint/zigzag boundaries, command counts, and tag-table
  resolution are all exercised by the generated shapes.
- GeoTIFF: random uint8 rasters under every layout/compression/
  predictor combination read back pixel-exact, full-frame and windowed.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from label_maker_dask_spark.sources import mvt
from label_maker_dask_spark.sources.mvt_write import encode_mvt
from label_maker_dask_spark.sources.tiff import TiffFile, read_tile
from label_maker_dask_spark.sources.tiff_write import write_geotiff

# --- strategies -------------------------------------------------------------

_coord = st.integers(min_value=0, max_value=4095)
_point = st.tuples(_coord, _coord).map(list)


def _ring():
    """Axis-aligned rectangles in the decoder's shell orientation —
    valid rings with deterministic positive raw area."""
    return st.tuples(
        st.integers(0, 3000), st.integers(0, 3000),
        st.integers(1, 900), st.integers(1, 900),
    ).map(
        lambda t: [
            [t[0], t[1]],
            [t[0] + t[2], t[1]],
            [t[0] + t[2], t[1] + t[3]],
            [t[0], t[1] + t[3]],
            [t[0], t[1]],
        ]
    )


_props = st.dictionaries(
    st.text(alphabet="abcdefgh_", min_size=1, max_size=6),
    st.one_of(
        st.integers(min_value=-(2**40), max_value=2**40),
        st.text(alphabet="xyz019 .", max_size=12),
        st.booleans(),
    ),
    max_size=4,
)

_geometry = st.one_of(
    _point.map(lambda p: {"type": "Point", "coordinates": p}),
    st.lists(_point, min_size=1, max_size=5).map(
        lambda ps: {"type": "MultiPoint", "coordinates": ps}
    ),
    st.lists(_point, min_size=2, max_size=6).map(
        lambda ps: {"type": "LineString", "coordinates": ps}
    ),
    st.lists(st.lists(_point, min_size=2, max_size=4), min_size=1, max_size=3).map(
        lambda ls: {"type": "MultiLineString", "coordinates": ls}
    ),
    _ring().map(lambda r: {"type": "Polygon", "coordinates": [r]}),
)

_feature = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=0, max_value=2**40),
        "geometry": _geometry,
        "properties": _props,
    }
)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(feats=st.lists(_feature, min_size=1, max_size=8))
def test_mvt_writer_roundtrips_random_features(feats):
    decoded = mvt.decode(encode_mvt({"osm": feats}), y_coord_down=True)
    got = decoded["osm"]["features"]
    assert len(got) == len(feats)
    for want, have in zip(feats, got):
        assert have["id"] == want["id"]
        assert have["properties"] == want["properties"]
        g_want, g_have = want["geometry"], have["geometry"]
        t = g_want["type"]
        if t == "MultiPoint" and len(g_want["coordinates"]) == 1:
            # decoder collapses a 1-point multipoint to Point
            assert g_have == {
                "type": "Point",
                "coordinates": g_want["coordinates"][0],
            }
        elif t == "MultiLineString" and len(g_want["coordinates"]) == 1:
            assert g_have == {
                "type": "LineString",
                "coordinates": g_want["coordinates"][0],
            }
        else:
            assert g_have["type"] == t
            assert g_have["coordinates"] == g_want["coordinates"]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(17, 80),
    w=st.integers(17, 80),
    spp=st.sampled_from([1, 3]),
    compression=st.sampled_from([1, 8]),
    predictor=st.sampled_from([1, 2]),
    tiled=st.booleans(),
)
def test_geotiff_writer_roundtrips_random_rasters(
    seed, h, w, spp, compression, predictor, tiled
):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, spp), dtype=np.uint8)
    data = write_geotiff(
        arr,
        (-10.0, -10.0, 10.0, 10.0),
        compression=compression,
        predictor=predictor,
        tiled=tiled,
        tile_size=32,
        rows_per_strip=16,
    )
    tif = TiffFile(data)
    assert np.array_equal(tif.read_rows(0, h), arr)
    # a column window decodes only what it needs and still matches
    c0, c1 = w // 4, max(w // 4 + 1, 3 * w // 4)
    assert np.array_equal(
        tif.read_rows(h // 4, max(h // 4 + 1, 3 * h // 4), c0, c1)[
            :, c0:c1
        ],
        arr[h // 4 : max(h // 4 + 1, 3 * h // 4), c0:c1],
    )


def test_geotiff_writer_windowed_slippy_read_matches_full():
    """A slippy-tile windowed read of a writer-produced raster equals the
    same resample computed from the full decoded frame."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(64, 96, 3), dtype=np.uint8)
    z, x, y = 10, 512, 340
    from label_maker_dask_spark.sources.tiff import _tile_bounds_4326

    bounds = _tile_bounds_4326(z, x, y)
    tif = TiffFile(
        write_geotiff(arr, bounds, tiled=True, tile_size=32, compression=8)
    )
    got = read_tile(tif, z, x, y)
    assert got.shape == (256, 256, 3)
    # the window covers the raster exactly: every source pixel value must
    # appear, and out-of-raster zeros must not (bounds == tile bounds)
    assert set(np.unique(got)) <= set(np.unique(arr))
