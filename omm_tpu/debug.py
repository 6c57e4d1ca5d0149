"""Debug image dumps: render baked micromap states over the alpha texture.

Analog of ommDebugSaveAsImages (debug_impl.cpp:132-509): draws every
primitive's micro-triangle states color-coded over the (upscaled) inverted
alpha texture and writes PNGs.  The reference rasterizes per micro-triangle
with the CPU conservative rasterizer; here the whole overlay is produced in
one vectorized pass — each canvas pixel computes its barycentric coordinates
in the macro triangle, maps them to the micro-triangle grid and through the
inverse bird curve (dbary2index) to its state.

State colors match the reference LUT (debug_impl.cpp:245-259):
Transparent=blue, Opaque=green, UnknownTransparent=magenta,
UnknownOpaque=yellow (monochrome mode folds UT into yellow).
"""
from __future__ import annotations

import os

import numpy as np

from . import bird, geom
from .stats import decode_states, get_omm_index
from .types import BakeInputDesc, BakeResult, get_num_micro_triangles

STATE_COLOR_DEFAULT = np.array(
    [[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 1.0], [1.0, 1.0, 0.0]],
    dtype=np.float32)
STATE_COLOR_MONO = np.array(
    [[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 1.0, 0.0], [1.0, 1.0, 0.0]],
    dtype=np.float32)


def _canvas(texture, scale: int) -> np.ndarray:
    """Inverted-alpha grayscale canvas, upscaled (debug_impl.cpp:147-157)."""
    a = texture.load_plane(0)
    gray = np.float32(1.0) - a
    gray = (np.int8(np.float32(127.0) * gray + np.float32(0.5))
            .astype(np.float32)) / np.float32(127.0)
    gray = np.clip(gray, 0.0, 1.0)
    up = np.repeat(np.repeat(gray, scale, axis=0), scale, axis=1)
    return np.stack([up, up, up], axis=-1)


def _de_degenerate(t: np.ndarray) -> np.ndarray:
    """Extrude the middle point of a degenerate triangle for display
    (debug_impl.cpp:190-217)."""
    p0, p1, p2 = t[0], t[1], t[2]
    aabb_s = t.min(axis=0)
    aabb_e = t.max(axis=0)

    def extrude(mid):
        d = aabb_e - aabb_s
        return np.float32(0.5) * np.array([d[1], -d[0]], np.float32) + mid

    d01 = np.linalg.norm(p0 - p1)
    d02 = np.linalg.norm(p0 - p2)
    d12 = np.linalg.norm(p1 - p2)
    t = t.copy()
    if d01 > d02 and d01 > d12:
        t[2] = extrude(p2)
    elif d02 > d01 and d02 > d12:
        t[1] = extrude(p1)
    else:
        t[0] = extrude(p0)
    return t


def render_overlay(desc: BakeInputDesc, result: BakeResult, scale: int = 5,
                   monochrome_unknowns: bool = False,
                   highlight_reuse: bool = True) -> np.ndarray:
    """Render all primitives into one RGB float image (h*scale, w*scale, 3)."""
    tex = desc.texture
    w, h = tex.size(0)
    img = _canvas(tex, scale)
    H, W = img.shape[:2]
    lut = STATE_COLOR_MONO if monochrome_unknowns else STATE_COLOR_DEFAULT

    tris = geom.triangles_from_indices(
        np.asarray(desc.index_buffer)[:desc.index_count], desc.tex_coords,
        desc.tex_coord_format, desc.tex_coord_stride_in_bytes)
    tri_count = desc.index_count // 3
    drawn: set[int] = set()

    for prim in range(tri_count):
        vm = get_omm_index(result, prim)
        if vm >= 0:
            d = result.desc_array[vm]
            level = d.subdivision_level
            states = decode_states(result.array_data, d.offset, level, d.format)
        else:
            level = 0
            states = np.array([~vm & 3], dtype=np.uint8)
        reuse = highlight_reuse and vm >= 0 and vm in drawn
        drawn.add(vm)

        t = tris[prim]
        if not np.isfinite(t).all():
            continue
        if bool(geom.is_degenerate(t)):
            t = _de_degenerate(t)

        # Pixel bounding box of the triangle on the canvas.
        px = t[:, 0] * W
        py = t[:, 1] * H
        x0 = max(int(np.floor(px.min())), 0)
        x1 = min(int(np.ceil(px.max())) + 1, W)
        y0 = max(int(np.floor(py.min())), 0)
        y1 = min(int(np.ceil(py.max())) + 1, H)
        if x1 <= x0 or y1 <= y0:
            continue

        ys, xs = np.meshgrid(np.arange(y0, y1), np.arange(x0, x1),
                             indexing="ij")
        cx = (xs.astype(np.float64) + 0.5)
        cy = (ys.astype(np.float64) + 0.5)
        # Barycentrics of pixel centers in the macro triangle.
        d = ((py[1] - py[2]) * (px[0] - px[2])
             + (px[2] - px[1]) * (py[0] - py[2]))
        if d == 0:
            continue
        bu = ((py[1] - py[2]) * (cx - px[2]) + (px[2] - px[1]) * (cy - py[2])) / d
        bv = ((py[2] - py[0]) * (cx - px[2]) + (px[0] - px[2]) * (cy - py[2])) / d
        bw = 1.0 - bu - bv
        inside = (bu >= 0) & (bv >= 0) & (bw >= 0)
        if not inside.any():
            continue

        # Map barycentrics (p1 weight, p2 weight) to the micro-tri grid and
        # through the inverse bird curve (bird.h:159-167).
        steps = float(1 << level)
        gu = np.clip((bv * steps).astype(np.int64), 0, (1 << level) - 1)
        gv = np.clip((bw * steps).astype(np.int64), 0, (1 << level) - 1)
        gw = np.clip(((1.0 - bv - bw) * steps).astype(np.int64), 0,
                     (1 << level) - 1)
        idx = bird.dbary2index(gu.astype(np.uint32), gv.astype(np.uint32),
                               gw.astype(np.uint32), level)
        idx = np.minimum(idx, get_num_micro_triangles(level) - 1)
        color = lut[states[idx]]
        if reuse:
            color = np.clip(color + np.float32(0.35), 0.0, 1.0)

        region = img[y0:y1, x0:x1]
        blended = np.where(inside[..., None],
                           0.6 * color + 0.4 * region, region)
        img[y0:y1, x0:x1] = blended.astype(np.float32)
    return img


def save_as_images(desc: BakeInputDesc, result: BakeResult, path: str,
                   file_postfix: str = "", one_file: bool = True,
                   dump_only_first_omm: bool = False,
                   monochrome_unknowns: bool = False,
                   detailed_cutout: bool = False, scale: int = 5) -> list[str]:
    """ommDebugSaveAsImages analog; returns written file paths."""
    os.makedirs(path, exist_ok=True)
    written = []
    if one_file:
        img = render_overlay(desc, result, scale=scale,
                             monochrome_unknowns=monochrome_unknowns)
        fname = os.path.join(path, f"0_{file_postfix}.png")
        _write_png(fname, img)
        written.append(fname)
    else:
        tri_count = desc.index_count // 3
        if dump_only_first_omm:
            tri_count = min(tri_count, 1)
        for prim in range(tri_count):
            sub = _single_prim_desc(desc, prim)
            img = render_overlay(sub, _single_prim_result(result, prim),
                                 scale=scale,
                                 monochrome_unknowns=monochrome_unknowns)
            fname = os.path.join(path, f"0_{prim}_{file_postfix}.png")
            _write_png(fname, img)
            written.append(fname)
    return written


def _single_prim_desc(desc: BakeInputDesc, prim: int) -> BakeInputDesc:
    import copy
    sub = copy.copy(desc)
    ib = np.asarray(desc.index_buffer).reshape(-1)[3 * prim:3 * prim + 3]
    sub.index_buffer = ib
    sub.index_count = 3
    return sub


def _single_prim_result(result: BakeResult, prim: int) -> BakeResult:
    import copy
    sub = copy.copy(result)
    sub.index_buffer = result.index_buffer[prim:prim + 1]
    return sub


def _write_png(fname: str, img: np.ndarray):
    from PIL import Image
    arr = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr, "RGB").save(fname)
