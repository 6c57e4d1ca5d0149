"""Rasterizer golden tests (test_raster_tri.cpp / test_raster_line.cpp
style): the conservative mask must over-cover exact coverage and stay tight;
line walks must connect endpoints."""
import numpy as np
import pytest

from omm_tpu import geom
from omm_tpu.kernels.levelline import conservative_raster_mask
from omm_tpu.kernels.raster import bresenham_line_cells, conservative_line_cells


def _conservative_mask(tri, size):
    """Dense conservative accept mask over an (size, size) grid."""
    t = np.asarray(tri, np.float32) * np.float32(size)
    ccw = bool(geom.is_ccw(t))
    qn = t if ccw else t[::-1]
    ys, xs = np.meshgrid(np.arange(size, dtype=np.int32),
                         np.arange(size, dtype=np.int32), indexing="ij")
    m = conservative_raster_mask(np, qn[None], xs[None], ys[None])[0]
    return m


def _exact_cover(tri, size, ss=8):
    """Supersampled ground-truth coverage: a texel is covered iff any
    sample point of its square is inside the triangle."""
    t = np.asarray(tri, np.float64) * size
    ys, xs = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    cover = np.zeros((size, size), bool)
    offs = (np.arange(ss) + 0.5) / ss
    for oy in offs:
        for ox in offs:
            px = xs + ox
            py = ys + oy
            d = ((t[1, 1] - t[2, 1]) * (t[0, 0] - t[2, 0])
                 + (t[2, 0] - t[1, 0]) * (t[0, 1] - t[2, 1]))
            bu = ((t[1, 1] - t[2, 1]) * (px - t[2, 0])
                  + (t[2, 0] - t[1, 0]) * (py - t[2, 1])) / d
            bv = ((t[2, 1] - t[0, 1]) * (px - t[2, 0])
                  + (t[0, 0] - t[2, 0]) * (py - t[2, 1])) / d
            cover |= (bu >= 0) & (bv >= 0) & (bu + bv <= 1)
    return cover


TRIS = [
    [[0.1, 0.1], [0.8, 0.2], [0.4, 0.9]],
    [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
    [[0.05, 0.9], [0.9, 0.85], [0.5, 0.1]],   # CW winding
    [[0.3, 0.3], [0.35, 0.31], [0.32, 0.4]],  # tiny
]


@pytest.mark.parametrize("tri", TRIS)
@pytest.mark.parametrize("size", [8, 32, 100])
def test_conservative_over_covers(tri, size):
    m = _conservative_mask(tri, size)
    exact = _exact_cover(tri, size)
    # over-conservative: every exactly-covered texel is accepted
    assert not (exact & ~m).any()
    # tight: accepted set is at most the exact set dilated by one texel
    grown = np.zeros_like(exact)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            grown |= np.roll(np.roll(exact, dy, 0), dx, 1)
    assert not (m & ~grown).any()


@pytest.mark.parametrize("tri", TRIS[:2])
def test_conservative_winding_invariant(tri, size=64):
    m1 = _conservative_mask(tri, size)
    m2 = _conservative_mask(np.asarray(tri)[::-1], size)
    assert (m1 == m2).all()


def test_bresenham_endpoints_connect():
    for p0, p1 in [((0.05, 0.05), (0.9, 0.4)), ((0.9, 0.1), (0.1, 0.85)),
                   ((0.2, 0.2), (0.2, 0.8)), ((0.1, 0.5), (0.9, 0.5))]:
        cells = bresenham_line_cells(p0, p1, (64, 64))
        assert len(cells) >= 1
        # 8-connected chain
        d = np.abs(np.diff(cells, axis=0))
        assert (d.max(axis=1) <= 1).all()
        xs = {int(p0[0] * 64), int(p1[0] * 64)}
        assert {int(cells[0][0]), int(cells[-1][0])} == xs


def test_conservative_line_covers_bresenham():
    """The conservative DDA must visit a superset of cells crossed by the
    segment (4-connected walk)."""
    for p0, p1 in [((0.05, 0.05), (0.9, 0.4)), ((0.1, 0.8), (0.85, 0.15)),
                   ((0.3, 0.1), (0.3, 0.9))]:
        cells = conservative_line_cells(np.array(p0, np.float32),
                                        np.array(p1, np.float32),
                                        (64, 64), (0.0, 0.0))
        d = np.abs(np.diff(cells, axis=0))
        # 4-connected: exactly one axis steps per move
        assert (d.sum(axis=1) == 1).all()


def test_point_segment():
    cells = conservative_line_cells(np.array([0.5, 0.5], np.float32),
                                    np.array([0.5, 0.5], np.float32),
                                    (64, 64), (0.0, 0.0))
    assert len(cells) == 1


def test_conservative_line_cells_batch_parity():
    """The vectorized DDA walk visits exactly the scalar walk's cells,
    in order, for random segments including axis-aligned, reversed and
    zero-length (point) ones."""
    from omm_tpu.kernels.raster import conservative_line_cells_batch

    rng = np.random.RandomState(7)
    p0 = rng.rand(64, 2).astype(np.float32)
    p1 = rng.rand(64, 2).astype(np.float32)
    p1[0] = p0[0]                     # point segment
    p1[1, 1] = p0[1, 1]               # horizontal
    p1[2, 0] = p0[2, 0]               # vertical
    p0[3], p1[3] = p1[3].copy(), p0[3].copy()  # reversed

    xs, ys, mask = conservative_line_cells_batch(p0, p1, (64, 64),
                                                 (-0.5, -0.5))
    for i in range(64):
        want = conservative_line_cells(p0[i], p1[i], (64, 64),
                                       (-0.5, -0.5))
        got = np.stack([xs[i][mask[i]], ys[i][mask[i]]], axis=-1)
        assert np.array_equal(got, want), i
