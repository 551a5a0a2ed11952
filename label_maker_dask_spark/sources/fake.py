"""Deterministic fake tile/imagery generators for hermetic tests.

Stand-ins for the live OSM-QA-tile and TMS/WMS/COG services the reference
hits over HTTP (reference main.py:37-44, utils.py:154-206).  Everything is a
pure function of (z, x, y) with a fixed seed, so golden tests are stable
across runs and machines.
"""

from __future__ import annotations

import json
from typing import List

import numpy as np

_PROPS_POOL = [
    {"highway": "residential", "name": "First St"},
    {"highway": "primary", "lanes": "2"},
    {"building": "yes", "height": "12"},
    {"building": "house"},
    {"natural": "water"},
    {"landuse": "park", "name": "Green"},
]


def _rng(z: int, x: int, y: int) -> np.random.Generator:
    return np.random.default_rng(abs(hash((int(z), int(x), int(y), 42))) % (2**32))


def fake_features(z: int, x: int, y: int) -> List[dict]:
    """0-6 deterministic features in 0-4096 tile-local space, mixing points,
    lines, and polygons; one tile in ~6 is empty (error-tolerance path)."""
    rng = _rng(z, x, y)
    n = int(rng.integers(0, 7))
    feats = []
    for i in range(n):
        kind = int(rng.integers(0, 3))
        props = dict(_PROPS_POOL[int(rng.integers(0, len(_PROPS_POOL)))])
        cx, cy = (int(v) for v in rng.integers(200, 3896, size=2))
        if kind == 0:
            geom = {"type": "Point", "coordinates": [cx, cy]}
        elif kind == 1:
            dx, dy = (int(v) for v in rng.integers(-800, 800, size=2))
            geom = {
                "type": "LineString",
                "coordinates": [[cx, cy], [cx + dx, cy + dy]],
            }
        else:
            r = int(rng.integers(100, 600))
            geom = {
                "type": "Polygon",
                "coordinates": [
                    [
                        [cx - r, cy - r],
                        [cx + r, cy - r],
                        [cx + r, cy + r],
                        [cx - r, cy + r],
                        [cx - r, cy - r],
                    ]
                ],
            }
        feats.append(
            {
                "id": int(z) * 10_000_000 + int(x) * 10_000 + int(y) * 10 + i,
                "geometry_type": geom["type"],
                "geometry": json.dumps(geom),
                "properties": props,
            }
        )
    return feats


def fake_image_bytes(z: int, x: int, y: int, size: int = 256) -> bytes:
    """Deterministic 256x256x3 uint8 raw image bytes for a tile (stands in
    for the TMS/WMS/COG fetch + decode, reference utils.py:154-206)."""
    rng = _rng(z, x, y)
    return rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8).tobytes()
