"""Rasterizer golden coverage matrix (the reference's parameterized
CW/CCW x scale sweep, test_raster_tri.cpp:182-284 + test_raster_line.cpp).

The reference instantiates 9 triangle shapes (contained, sub-pixel,
sub-pixel-max-coverage, partially covered x2, fully covered, and three
"borked" fp-edge cases) and runs each at 4 scales plus CW and CCW — its
goldens are dumped PNGs.  Here the same matrix pins DIRECT goldens on the
conservative raster mask: exact accepted-texel counts and a hash of the
coverage bitmap, plus supersampled over-coverage bounds so a stale golden
cannot mask a real regression.  Line walks get the same treatment for the
conservative DDA (`conservative_line_cells`).
"""
import hashlib

import numpy as np
import pytest

from omm_tpu import geom
from omm_tpu.kernels.levelline import conservative_raster_mask
from omm_tpu.kernels.raster import conservative_line_cells

# the reference's 9 parameterized shapes (test_raster_tri.cpp:226-284),
# UV space, CCW as instantiated there
SHAPES = {
    "contained": [[0.2, 0.2], [0.7, 0.5], [0.3, 0.8]],
    "subpixel": [[0.2, 0.2], [0.21, 0.21], [0.2, 0.21]],
    "subpixel_max": [[0.2, 0.2], [0.25, 0.24], [0.2, 0.25]],
    "partial": [[-0.1, -0.1], [1.1, -0.1], [-0.1, 1.1]],
    "partial2": [[-0.2, 0.2], [0.7, 0.5], [-0.3, 0.8]],
    "full": [[-0.1, -1.1], [2.1, 1.1], [-0.1, 1.1]],
    "borked": [[0.609000027, 0.332400024], [0.332400024, 0.402599990],
               [0.402599990, 0.332400024]],
    "borked3": [[0.809000027, 0.332400024], [0.332400024, 0.502599990],
                [0.402599990, 0.332400024]],
    # degenerate sliver at raster scale (our extra fp-edge case)
    "sliver": [[0.1, 0.1], [0.9, 0.100001], [0.5, 0.1000005]],
}
# small / base / large / super-large (the reference's 512/1024/2048/4096
# halved: identical fp-robustness coverage, 16x cheaper in CI)
SCALES = (256, 512, 1024, 2048)

LINES = {
    "diag": ((0.05, 0.05), (0.9, 0.4)),
    "steep": ((0.9, 0.1), (0.1, 0.85)),
    "vertical": ((0.2, 0.2), (0.2, 0.8)),
    "horizontal": ((0.1, 0.5), (0.9, 0.5)),
    "subcell": ((0.501, 0.501), (0.502, 0.503)),
    "corner_graze": ((0.0, 0.0), (1.0, 1.0)),
}
LINE_SIZES = (64, 512)


def mask_for(tri, size, cw):
    """Dense conservative accept mask of `tri` scaled to (size, size).

    conservative_raster_mask is the edge-test half of the reference's
    SquareInTriangleSkipAABBTest — the raster loop supplies the AABB
    clamp (cpu_raster.h:304-333), applied here the same way.
    """
    t = np.asarray(tri, np.float32) * np.float32(size)
    if cw:
        t = t[::-1].copy()
    ccw = bool(geom.is_ccw(t))
    qn = t if ccw else t[::-1]
    ys, xs = np.meshgrid(np.arange(size, dtype=np.int32),
                         np.arange(size, dtype=np.int32), indexing="ij")
    m = conservative_raster_mask(np, qn[None], xs[None], ys[None])[0]
    fx = xs.astype(np.float32)
    fy = ys.astype(np.float32)
    aabb = ((fx + 1 > t[:, 0].min()) & (fx < t[:, 0].max())
            & (fy + 1 > t[:, 1].min()) & (fy < t[:, 1].max()))
    return m & aabb


def line_cells(p0, p1, size):
    cells = conservative_line_cells(np.array(p0, np.float32),
                                    np.array(p1, np.float32),
                                    (size, size), (0.0, 0.0))
    # the walk visits up to ceil(endpoint); production consumers clip to
    # the grid.  The walk is monotone, so in-bounds cells are contiguous.
    keep = ((cells >= 0) & (cells < size)).all(axis=1)
    return cells[keep]


def _h(arr):
    return hashlib.sha1(np.packbits(arr).tobytes()).hexdigest()[:16]


def _sat_cover(tri, size):
    """Exact (float64 SAT) texel-square vs triangle overlap: the ideal
    conservative coverage.  Separating axes for box-vs-convex-polygon are
    the two box axes plus the three edge normals; touching counts as
    overlap."""
    t = np.asarray(tri, np.float64) * size
    ys, xs = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    x0 = xs.astype(np.float64)
    y0 = ys.astype(np.float64)
    # box axes (the triangle AABB test)
    overlap = ((t[:, 0].min() <= x0 + 1) & (x0 <= t[:, 0].max())
               & (t[:, 1].min() <= y0 + 1) & (y0 <= t[:, 1].max()))
    # edge-normal axes: box is fully outside edge i iff the box corner
    # closest to the edge (w.r.t. the normal) is strictly outside
    for i in range(3):
        v0 = t[i]
        v1 = t[(i + 1) % 3]
        n = np.array([v1[1] - v0[1], v0[0] - v1[0]])  # one side's normal
        for sgn in (1.0, -1.0):
            nn = n * sgn
            cx = x0 + (nn[0] < 0)  # corner minimizing dot(nn, c)
            cy = y0 + (nn[1] < 0)
            dmin = nn[0] * (cx - v0[0]) + nn[1] * (cy - v0[1])
            # all triangle verts on the non-positive side of (v0, nn)?
            tri_side = max(nn[0] * (t[j, 0] - v0[0])
                           + nn[1] * (t[j, 1] - v0[1]) for j in range(3))
            if tri_side <= 1e-9 * max(1.0, abs(nn).max() * size):
                overlap &= dmin <= 0
    return overlap


def _exact_cover(tri, size, ss=4):
    """Supersampled ground-truth coverage (float64): a texel is covered
    iff any sample point of its square is inside the triangle."""
    t = np.asarray(tri, np.float64) * size
    ys, xs = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    cover = np.zeros((size, size), bool)
    offs = (np.arange(ss) + 0.5) / ss
    d = ((t[1, 1] - t[2, 1]) * (t[0, 0] - t[2, 0])
         + (t[2, 0] - t[1, 0]) * (t[0, 1] - t[2, 1]))
    if d == 0:
        return cover
    for oy in offs:
        for ox in offs:
            px = xs + ox
            py = ys + oy
            bu = ((t[1, 1] - t[2, 1]) * (px - t[2, 0])
                  + (t[2, 0] - t[1, 0]) * (py - t[2, 1])) / d
            bv = ((t[2, 1] - t[0, 1]) * (px - t[2, 0])
                  + (t[0, 0] - t[2, 0]) * (py - t[2, 1])) / d
            cover |= (bu >= 0) & (bv >= 0) & (bu + bv <= 1)
    return cover


# generated by tools/gen_raster_goldens.py — pinned (count, bitmap sha1)
TRI_GOLDENS = {
    ('contained', 256, False): (9117, '0171ad64e1cb2aef'),
    ('contained', 256, True): (9117, '0171ad64e1cb2aef'),
    ('contained', 512, False): (35983, '583c3444123b9ce9'),
    ('contained', 512, True): (35983, '583c3444123b9ce9'),
    ('contained', 1024, False): (142731, '8f023c8f67d2711f'),
    ('contained', 1024, True): (142731, '8f023c8f67d2711f'),
    ('contained', 2048, False): (568368, '493fa2cb7b57a782'),
    ('contained', 2048, True): (568368, '493fa2cb7b57a782'),
    ('subpixel', 256, False): (6, 'c7c462a86a7ff252'),
    ('subpixel', 256, True): (6, 'c7c462a86a7ff252'),
    ('subpixel', 512, False): (21, 'cf0bd860677acebb'),
    ('subpixel', 512, True): (21, 'cf0bd860677acebb'),
    ('subpixel', 1024, False): (78, '178fd0b3e527ea10'),
    ('subpixel', 1024, True): (78, '178fd0b3e527ea10'),
    ('subpixel', 2048, False): (264, '91e25a4ec695ebc4'),
    ('subpixel', 2048, True): (264, '91e25a4ec695ebc4'),
    ('subpixel_max', 256, False): (103, '5594e1da39afc076'),
    ('subpixel_max', 256, True): (103, '5594e1da39afc076'),
    ('subpixel_max', 512, False): (376, '6f1960e9ddfb7296'),
    ('subpixel_max', 512, True): (376, '6f1960e9ddfb7296'),
    ('subpixel_max', 1024, False): (1429, 'cd9f968e3f951c04'),
    ('subpixel_max', 1024, True): (1429, 'cd9f968e3f951c04'),
    ('subpixel_max', 2048, False): (5458, '837f4f70a069fd45'),
    ('subpixel_max', 2048, True): (5458, '837f4f70a069fd45'),
    ('partial', 256, False): (32896, '2d90f93392390bab'),
    ('partial', 256, True): (32896, '2d90f93392390bab'),
    ('partial', 512, False): (131328, '0d2cbb191cd8a1d0'),
    ('partial', 512, True): (131328, '0d2cbb191cd8a1d0'),
    ('partial', 1024, False): (524800, '43500e842e9bdfcb'),
    ('partial', 1024, True): (524800, '43500e842e9bdfcb'),
    ('partial', 2048, False): (2098176, '1264decce8c1fb29'),
    ('partial', 2048, True): (2098176, '1264decce8c1fb29'),
    ('partial2', 256, False): (10422, '61ae15a3839e5b20'),
    ('partial2', 256, True): (10422, '61ae15a3839e5b20'),
    ('partial2', 512, False): (41172, '8824e4d4941bf274'),
    ('partial2', 512, True): (41172, '8824e4d4941bf274'),
    ('partial2', 1024, False): (163584, '859536cd14b1f552'),
    ('partial2', 1024, True): (163584, '859536cd14b1f552'),
    ('partial2', 2048, False): (652614, '599bd412974ec0e0'),
    ('partial2', 2048, True): (652614, '599bd412974ec0e0'),
    ('full', 256, False): (65536, '5e2b96c19c4f5c63'),
    ('full', 256, True): (65536, '5e2b96c19c4f5c63'),
    ('full', 512, False): (262144, 'ca711c69165e1fa5'),
    ('full', 512, True): (262144, 'ca711c69165e1fa5'),
    ('full', 1024, False): (1048576, '7e6591cd465cbb35'),
    ('full', 1024, True): (1048576, '7e6591cd465cbb35'),
    ('full', 2048, False): (4194304, '13a184ec9e176371'),
    ('full', 2048, True): (4194304, '13a184ec9e176371'),
    ('borked', 256, False): (536, '7fee7d3f776c16d6'),
    ('borked', 256, True): (536, '7fee7d3f776c16d6'),
    ('borked', 512, False): (2037, '82aeac1df2186416'),
    ('borked', 512, True): (2037, '82aeac1df2186416'),
    ('borked', 1024, False): (7938, '0ab41c9c5e19ae3c'),
    ('borked', 1024, True): (7938, '0ab41c9c5e19ae3c'),
    ('borked', 2048, False): (31174, '490a108a767bb877'),
    ('borked', 2048, True): (31174, '490a108a767bb877'),
    ('borked3', 256, False): (2387, 'f0aec7d7548c6d52'),
    ('borked3', 256, True): (2387, 'f0aec7d7548c6d52'),
    ('borked3', 512, False): (9332, '0248bf564a235c1d'),
    ('borked3', 512, True): (9332, '0248bf564a235c1d'),
    ('borked3', 1024, False): (36885, '5c158d6a88fb0b3f'),
    ('borked3', 1024, True): (36885, '5c158d6a88fb0b3f'),
    ('borked3', 2048, False): (146596, '036491d09f9547ed'),
    ('borked3', 2048, True): (146596, '036491d09f9547ed'),
    ('sliver', 256, False): (206, 'a84a00989d36c73e'),
    ('sliver', 256, True): (206, 'a84a00989d36c73e'),
    ('sliver', 512, False): (410, '5f56b977b424daff'),
    ('sliver', 512, True): (410, '5f56b977b424daff'),
    ('sliver', 1024, False): (820, 'beca17fd4c905ce2'),
    ('sliver', 1024, True): (820, 'beca17fd4c905ce2'),
    ('sliver', 2048, False): (1640, '972cd748bbe1a232'),
    ('sliver', 2048, True): (1640, '972cd748bbe1a232'),
}
LINE_GOLDENS = {
    ('diag', 64): (79, 'bbe07f564d7bc62a'),
    ('diag', 512): (617, 'fb6adcccb66320ad'),
    ('steep', 64): (101, 'f59d11b45513455d'),
    ('steep', 512): (795, '3c69aa831b87b284'),
    ('vertical', 64): (41, '6894576b786fbbf7'),
    ('vertical', 512): (309, 'f80d1a16bacdc45a'),
    ('horizontal', 64): (53, '300d743e5e46bdb9'),
    ('horizontal', 512): (411, '62bd699270194b45'),
    ('subcell', 64): (3, '334e08fdb7b47489'),
    ('subcell', 512): (4, '2b383a4ca2d5e105'),
    ('corner_graze', 64): (127, 'fcccee6331af1ae0'),
    ('corner_graze', 512): (1023, 'ee5bc1c942d5bc7d'),
}


@pytest.mark.parametrize("cw", [False, True], ids=["ccw", "cw"])
@pytest.mark.parametrize("scale", SCALES)
@pytest.mark.parametrize("name", sorted(SHAPES))
def test_conservative_mask_golden(name, scale, cw):
    m = mask_for(SHAPES[name], scale, cw)
    got = (int(m.sum()), _h(m))
    assert TRI_GOLDENS[(name, scale, cw)] == got

    # structural bounds independent of the pinned values:
    # (a) conservative — every supersampled-inside texel is accepted
    exact = _exact_cover(SHAPES[name], scale)
    assert not (exact & ~m).any()
    # (b) tight — nothing accepted beyond a one-texel dilation of the
    # exact square-overlap coverage (float64 SAT ground truth)
    sat = _sat_cover(SHAPES[name], scale)
    grown = np.zeros_like(sat)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            grown |= np.roll(np.roll(sat, dy, 0), dx, 1)
    # roll wraps at the border; ignore border texels for the tightness
    # bound (clipping there is legitimate coverage)
    inner = np.zeros_like(sat)
    inner[1:-1, 1:-1] = True
    assert not (m & ~grown & inner).any()


@pytest.mark.parametrize("cw", [False, True], ids=["ccw", "cw"])
@pytest.mark.parametrize("scale", SCALES)
@pytest.mark.parametrize("name", sorted(SHAPES))
def test_conservative_mask_winding_invariant(name, scale, cw):
    """CW goldens must equal CCW goldens — winding cannot change
    coverage (the reference runs its whole matrix under both)."""
    assert TRI_GOLDENS[(name, scale, cw)] == TRI_GOLDENS[(name, scale,
                                                          not cw)]


@pytest.mark.parametrize("size", LINE_SIZES)
@pytest.mark.parametrize("name", sorted(LINES))
def test_conservative_line_golden(name, size):
    p0, p1 = LINES[name]
    cells = line_cells(p0, p1, size)
    grid = np.zeros((size, size), bool)
    grid[cells[:, 1], cells[:, 0]] = True
    assert LINE_GOLDENS[(name, size)] == (len(cells), _h(grid))

    # structural: a 4-connected walk whose ends land on (or one
    # conservative over-step past) the endpoint cells; the walk runs from
    # the lower-x endpoint regardless of segment orientation
    d = np.abs(np.diff(cells, axis=0))
    assert (d.sum(axis=1) == 1).all()
    ends = np.array([cells[0], cells[-1]])
    for p in (p0, p1):
        e = np.array([min(int(p[0] * size), size - 1),
                      min(int(p[1] * size), size - 1)])
        assert np.abs(ends - e).max(axis=1).min() <= 1, (name, size, e, ends)
