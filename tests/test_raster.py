"""Numpy rasterizer unit tests (pixel-center fill, line burn, overwrite)."""

import numpy as np

from label_maker_dask_spark.raster import rasterize


def test_square_fill_exact():
    # square [10,10]..[20,20]: pixel centers 10.5..19.5 inside -> 10x10 cells
    geom = {"type": "Polygon",
            "coordinates": [[[10, 10], [20, 10], [20, 20], [10, 20], [10, 10]]]}
    out = rasterize([(geom, 3)], out_shape=(32, 32))
    assert out.sum() == 3 * 100
    assert out[10, 10] == 3 and out[19, 19] == 3
    assert out[9, 10] == 0 and out[20, 10] == 0


def test_polygon_hole():
    geom = {"type": "Polygon", "coordinates": [
        [[0, 0], [30, 0], [30, 30], [0, 30], [0, 0]],
        [[10, 10], [20, 10], [20, 20], [10, 20], [10, 10]],
    ]}
    out = rasterize([(geom, 1)], out_shape=(32, 32))
    assert out[5, 5] == 1
    assert out[15, 15] == 0       # inside the hole
    assert out[25, 25] == 1


def test_point_and_line():
    pt = {"type": "Point", "coordinates": [5.5, 7.5]}
    line = {"type": "LineString", "coordinates": [[0, 0], [10, 10]]}
    out = rasterize([(pt, 9), (line, 2)], out_shape=(16, 16))
    assert out[7, 5] == 9
    # diagonal line passes through (i, i) cells
    for i in range(10):
        assert out[i, i] == 2


def test_overwrite_order():
    a = {"type": "Polygon",
         "coordinates": [[[0, 0], [16, 0], [16, 16], [0, 16], [0, 0]]]}
    b = {"type": "Polygon",
         "coordinates": [[[4, 4], [12, 4], [12, 12], [4, 12], [4, 4]]]}
    out = rasterize([(a, 1), (b, 2)], out_shape=(16, 16))
    assert out[8, 8] == 2
    assert out[1, 1] == 1


def test_out_of_grid_clips():
    geom = {"type": "Polygon",
            "coordinates": [[[-10, -10], [5, -10], [5, 5], [-10, 5], [-10, -10]]]}
    out = rasterize([(geom, 1)], out_shape=(8, 8))
    assert out[0, 0] == 1 and out[4, 4] == 1
    assert out[5, 5] == 0


def test_multi_geometries():
    geom = {"type": "MultiPoint", "coordinates": [[1.5, 1.5], [3.5, 3.5]]}
    out = rasterize([(geom, 4)], out_shape=(8, 8))
    assert out[1, 1] == 4 and out[3, 3] == 4
    assert out.sum() == 8


def test_rasterize_accepts_3d_positions():
    """GeoJSON positions may carry an altitude; burn must use (x, y) only
    and not crash on 3-element coordinates."""
    import numpy as np

    from label_maker_dask_spark.raster import rasterize

    line = {"type": "LineString", "coordinates": [[0, 0, 5], [10, 0, 5]]}
    poly = {"type": "Polygon",
            "coordinates": [[[20, 20, 1], [40, 20, 1], [40, 40, 1],
                             [20, 40, 1], [20, 20, 1]]]}
    arr = rasterize([(line, 1), (poly, 2)])
    assert arr[0, 0] == 1 and arr[0, 5] == 1
    assert arr[30, 30] == 2
    assert int(np.count_nonzero(arr == 2)) > 0


def test_morph_disk_dilate_single_pixel():
    from label_maker_dask_spark.raster import morph_disk

    m = np.zeros((9, 9), dtype=bool)
    m[4, 4] = True
    out = morph_disk(m, 2.0)
    # lattice disk of radius 2: 13 cells ((±1,±1) in, (±2,±1) out)
    assert out.sum() == 13
    assert out[2, 4] and out[4, 2] and out[3, 3] and not out[2, 2]


def test_rasterize_buffer_rectangle_closed_form():
    # pixel-space rect w=16, h=8; dilation by d=2 adds 2d(w+h) edge strips
    # plus 4*Q(2)=4 corner cells (Q(2)=1: only offset (1,1) fits the disk)
    rect = {"type": "Polygon",
            "coordinates": [[[4, 4], [20, 4], [20, 12], [4, 12], [4, 4]]]}
    out = rasterize([(rect, 1, 2.0)], out_shape=(32, 32))
    assert (out == 1).sum() == 16 * 8 + 2 * 2 * (16 + 8) + 4


def test_rasterize_negative_buffer_erodes():
    rect = {"type": "Polygon",
            "coordinates": [[[4, 4], [20, 4], [20, 12], [4, 12], [4, 4]]]}
    out = rasterize([(rect, 1, -2.0)], out_shape=(32, 32))
    assert (out == 1).sum() == (16 - 4) * (8 - 4)
    # a rect flush against the grid edge erodes from that edge too (the
    # off-grid surround acts as the clip boundary, like the reference's
    # clip-then-buffer order)
    flush = {"type": "Polygon",
             "coordinates": [[[0, 0], [16, 0], [16, 8], [0, 8], [0, 0]]]}
    out2 = rasterize([(flush, 1, -2.0)], out_shape=(32, 32))
    assert (out2 == 1).sum() == (16 - 4) * (8 - 4)


def test_rasterize_buffer_replace_ring():
    """A buffered lower class burned before an unbuffered higher class
    leaves a visible ring — the reference's REPLACE order with per-class
    buffers."""
    rect = {"type": "Polygon",
            "coordinates": [[[8, 8], [24, 8], [24, 16], [8, 16], [8, 8]]]}
    out = rasterize([(rect, 1, 3.0), (rect, 2, 0.0)], out_shape=(32, 32))
    w, h = 16, 8
    assert (out == 2).sum() == w * h
    # Q(3) = 4  ->  ring = A(3) - A(0) = 6(w+h) + 16
    assert (out == 1).sum() == 6 * (w + h) + 16
