"""Generate the pinned golden table for tests/test_raster_goldens.py.

Prints a Python dict literal: (shape, size, winding) -> (count, sha1) for
the conservative triangle mask, and (segment, size) -> (count, sha1) for
the conservative line walk.  Run once, paste into the test, review the
counts for sanity (they are also asserted against supersampled coverage
bounds in the test itself, so a wrong golden cannot hide a regression).
"""
import hashlib
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
from test_raster_goldens import (LINES, LINE_SIZES, SCALES, SHAPES,  # noqa: E402
                                 line_cells, mask_for)


def _h(arr):
    return hashlib.sha1(np.packbits(arr).tobytes()).hexdigest()[:16]


def main():
    print("TRI_GOLDENS = {")
    for name, tri in SHAPES.items():
        for scale in SCALES:
            for cw in (False, True):
                m = mask_for(tri, scale, cw)
                print(f"    ({name!r}, {scale}, {cw}): "
                      f"({int(m.sum())}, {_h(m)!r}),")
    print("}")
    print("LINE_GOLDENS = {")
    for name, (p0, p1) in LINES.items():
        for size in LINE_SIZES:
            cells = line_cells(p0, p1, size)
            grid = np.zeros((size, size), bool)
            grid[cells[:, 1], cells[:, 0]] = True
            print(f"    ({name!r}, {size}): "
                  f"({len(cells)}, {_h(grid)!r}),")
    print("}")


if __name__ == "__main__":
    main()
