"""Line rasterization: conservative DDA cell walk + Bresenham.

Ports of RasterizeLineConservativeImpl (util/cpu_raster.h:487-555) and the
Bresenham RasterizeLineImpl (cpu_raster.h:385-484).  The walks are
inherently sequential per segment; degenerate (point/line) UV triangles are
rare, so these run on host in fp32 numpy and yield visited cell lists.
"""
from __future__ import annotations

import numpy as np

F = np.float32


def bresenham_line_cells(p0, p1, raster_size):
    """Visited cells of the Bresenham walk (cpu_raster.h:385-484).

    Endpoints are swapped so p0.x <= p1.x before scaling, like the
    reference.  Returns int32 (K, 2)."""
    a = np.asarray(p0, np.float32)
    b = np.asarray(p1, np.float32)
    if a[0] > b[0]:
        a, b = b, a
    x0 = int(a[0] * raster_size[0])
    x1 = int(b[0] * raster_size[0])
    y0 = int(a[1] * raster_size[1])
    y1 = int(b[1] * raster_size[1])

    cells = []

    def plot_low(x0, y0, x1, y1):
        dx = x1 - x0
        dy = y1 - y0
        yi = 1
        if dy < 0:
            yi = -1
            dy = -dy
        d = 2 * dy - dx
        y = y0
        for x in range(x0, x1 + 1):
            cells.append((x, y))
            if d > 0:
                y += yi
                d += 2 * (dy - dx)
            else:
                d += 2 * dy

    def plot_high(x0, y0, x1, y1):
        dx = x1 - x0
        dy = y1 - y0
        xi = 1
        if dx < 0:
            xi = -1
            dx = -dx
        d = 2 * dx - dy
        x = x0
        for y in range(y0, y1 + 1):
            cells.append((x, y))
            if d > 0:
                x += xi
                d += 2 * (dx - dy)
            else:
                d += 2 * dx

    if abs(y1 - y0) < abs(x1 - x0):
        if x0 > x1:
            plot_low(x1, y1, x0, y0)
        else:
            plot_low(x0, y0, x1, y1)
    else:
        if y0 > y1:
            plot_high(x1, y1, x0, y0)
        else:
            plot_high(x0, y0, x1, y1)
    return np.asarray(cells, dtype=np.int32).reshape(-1, 2)


def conservative_line_cells(p0, p1, raster_size, offset):
    """Visited (x, y) int cells of the conservative DDA walk.

    p0, p1: (2,) fp32 segment endpoints in UV space.
    raster_size: (w, h) ints; offset: (2,) fp32 (pixel units).
    Returns int32 array (K, 2).
    """
    rf = np.array(raster_size, dtype=np.float32)
    off = np.array(offset, dtype=np.float32)
    a = np.asarray(p0, dtype=np.float32) * rf + off
    b = np.asarray(p1, dtype=np.float32) * rf + off
    if a[0] > b[0]:
        a, b = b, a

    direction = b - a
    origin = a
    x = int(np.floor(a[0]))
    y = int(np.floor(a[1]))

    step_x = 1 if direction[0] > 0 else (-1 if direction[0] < 0 else 0)
    step_y = 1 if direction[1] > 0 else (-1 if direction[1] < 0 else 0)

    inf = np.float32(np.inf)
    t_delta_x = F(1.0) / np.abs(direction[0]) if step_x != 0 else inf
    t_delta_y = F(1.0) / np.abs(direction[1]) if step_y != 0 else inf

    if step_x != 0:
        next_bx = F(x + (1.0 if step_x > 0 else 0.0))
        t_max_x = (next_bx - origin[0]) / direction[0]
    else:
        t_max_x = inf
    if step_y != 0:
        next_by = F(y + (1.0 if step_y > 0 else 0.0))
        t_max_y = (next_by - origin[1]) / direction[1]
    else:
        t_max_y = inf

    if step_x == 0 and step_y == 0:
        return np.array([[x, y]], dtype=np.int32)

    y_min = int(min(np.floor(a[1]), np.floor(b[1])))
    y_max = int(max(np.ceil(a[1]), np.ceil(b[1])))
    x_min = int(min(np.floor(a[0]), np.floor(b[0])))
    x_max = int(max(np.ceil(a[0]), np.ceil(b[0])))

    cells = []
    while x_min <= x <= x_max and y_min <= y <= y_max:
        cells.append((x, y))
        if t_max_x < t_max_y:
            x += step_x
            t_max_x = F(t_max_x + t_delta_x)
        else:
            y += step_y
            t_max_y = F(t_max_y + t_delta_y)
    return np.asarray(cells, dtype=np.int32).reshape(-1, 2)
