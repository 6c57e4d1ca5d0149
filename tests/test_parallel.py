"""Multi-chip sharding: shard_map bake step on the virtual 8-device mesh."""
import numpy as np

import omm_tpu as omm
from omm_tpu import engine, geom
from omm_tpu.parallel import classify_item_sharded, make_mesh, sharded_bake_step

from fixtures import standard_circle


def _setup(size=64, subdiv=3):
    tex = omm.Texture([standard_circle(size, size)], omm.TextureFormat.FP32)
    uv = np.array([[0.1, 0.1], [0.15, 0.9], [0.9, 0.85]], np.float32)
    info = tex.info[0]
    import jax.numpy as jnp
    from omm_tpu.kernels.jax_classify import _window_bounds
    W, H = _window_bounds(tex, uv, subdiv)[0]
    meta = dict(size=info.size, size_log2=info.size_log2,
                is_pow2=info.is_pow2,
                rcp=(float(info.rcp_size[0]), float(info.rcp_size[1])),
                W=W, H=H)
    cfg = dict(addr_mode=omm.TextureAddressMode.Clamp, alpha_cutoff=0.5,
               border_alpha=0.0, fmt=omm.Format.OC1_4_State,
               promotion=omm.UnknownStatePromotion.Nearest,
               cutoff_gt=omm.OpacityState.Opaque,
               cutoff_le=omm.OpacityState.Transparent)
    return tex, uv, jnp.asarray(tex.load_plane(0)), meta, cfg


def test_sharded_matches_oracle():
    import jax
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    tex, uv, plane, meta, cfg = _setup()
    mesh = make_mesh()
    ccw = bool(geom.is_ccw(uv))
    states, hist = classify_item_sharded(mesh, plane, uv, ccw, subdiv=3,
                                         **meta, **cfg)
    states = np.asarray(states)

    rcfg = engine.ResampleConfig(
        addr_mode=cfg["addr_mode"], filter=omm.TextureFilterMode.Linear,
        alpha_cutoff=0.5, border_alpha=0.0, fmt=cfg["fmt"],
        promotion=cfg["promotion"], cutoff_gt=cfg["cutoff_gt"],
        cutoff_le=cfg["cutoff_le"])
    M = omm.get_num_micro_triangles(3)
    want = engine.resample_fine_item(tex, rcfg, uv, 3,
                                     np.full(M, 3, np.uint8))
    assert (states == want).all()
    # psum'd histogram is globally consistent
    h = np.asarray(hist)
    assert h.sum() == M
    for s in range(4):
        assert h[s] == np.count_nonzero(states == s)


def test_sharded_bake_step_batch():
    tex, uv, plane, meta, cfg = _setup()
    mesh = make_mesh()
    ccw = bool(geom.is_ccw(uv))
    uv2 = uv + np.float32(0.02)
    states, hist = sharded_bake_step(
        mesh, plane, np.stack([uv, uv2]), np.array([ccw, ccw]), subdiv=3,
        **meta, **cfg)
    assert states.shape == (2, 64)
    assert int(np.asarray(hist).sum()) == 2 * 64


def test_sharded_group_resolve_matches_single_device():
    """Hierarchical phase-1 group resolve sharded over 8 devices equals
    the unsharded computation, and the psum'd counts are consistent."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import omm_tpu as omm
    from omm_tpu.kernels.twophase import (_bary_cols, _class_plane,
                                          _window_origin)
    from omm_tpu.parallel.shard import make_mesh, sharded_group_resolve
    from fixtures import standard_circle

    plane = standard_circle(32, 32)
    pad = 8
    planeP = jnp.pad(jnp.asarray(plane), pad, mode="edge")
    cls = _class_plane(planeP, 3, 3, 0.5, 2.0 ** -14)
    rng = np.random.RandomState(3)
    uv_tris = (rng.rand(2, 3, 2) * 0.7 + 0.1).astype(np.float32)

    subdiv, lg = 4, 2
    mesh = make_mesh(jax.devices()[:8])
    side, counts = sharded_group_resolve(
        mesh, cls, uv_tris, subdiv=subdiv, lg=lg, pad=pad, size=(32, 32))

    # unsharded reference
    NG = 4 ** lg
    bu, bv, bd = _bary_cols(jnp.arange(NG, dtype=jnp.uint32), lg)
    uvf = jnp.asarray(uv_tris.reshape(2, 6))
    tri6 = tuple(uvf[:, k:k + 1] for k in range(6))
    x0, y0 = _window_origin(tri6, bu[None, :], bv[None, :], bd[None, :],
                            32, 32)
    want = np.asarray(cls)[np.asarray(y0) - 1 + pad,
                           np.asarray(x0) - 1 + pad]
    assert np.array_equal(np.asarray(side), want)
    c = np.asarray(counts)
    assert c.sum() == 2 * NG
    assert c[0] == (want == 1).sum()
    assert c[2] == (want == 0).sum()


def test_sharded_full_pipeline_matches_single_device():
    """Stages A-D (descent, compaction, exact kernel, pack) under
    shard_map on the 8-device mesh: per-item states bit-equal to the
    single-device two-phase engine AND to the fine-pass oracle; survivor
    counts and histogram psum-merged."""
    import jax
    assert len(jax.devices()) == 8
    from omm_tpu.kernels import twophase as tp
    from omm_tpu.parallel.shard import make_mesh, sharded_classify_batch

    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    subdiv = 5
    M = omm.get_num_micro_triangles(subdiv)
    rng = np.random.RandomState(11)
    tris = []
    for _ in range(8):
        b = rng.rand(2).astype(np.float32) * 0.25
        tris.append(np.array([b + [0.05, 0.08], b + [0.12, 0.7],
                              b + [0.72, 0.6]], np.float32))
    cfg = engine.ResampleConfig(
        addr_mode=omm.TextureAddressMode.Clamp,
        filter=omm.TextureFilterMode.Linear, alpha_cutoff=0.5,
        border_alpha=0.0, fmt=omm.Format.OC1_4_State,
        promotion=omm.UnknownStatePromotion.Nearest,
        cutoff_gt=omm.OpacityState.Opaque,
        cutoff_le=omm.OpacityState.Transparent)

    mesh = make_mesh()
    items = [(t, np.full(M, 3, np.uint8)) for t in tris]
    got, hist = sharded_classify_batch(mesh, tex, cfg, items, subdiv)

    single = tp.classify_work_items_batch(
        tex, cfg, [(t, np.full(M, 3, np.uint8)) for t in tris], subdiv)
    assert hist.sum() == 8 * M
    for t, g, s in zip(tris, got, single):
        assert (g == s).all(), "sharded != single-device engine"
        want = engine.resample_fine_item(tex, cfg, t, subdiv,
                                         np.full(M, 3, np.uint8))
        assert (g == want).all(), "sharded != oracle"
    counts = np.zeros(4, np.int64)
    for g in got:
        counts += np.bincount(g, minlength=4)[:4]
    assert np.array_equal(counts, hist)


def test_dryrun_multichip_gate():
    """The driver's multi-chip gate: must pass from an arbitrary parent
    environment (forces the virtual CPU mesh in a clean subprocess)."""
    import os
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    try:
        import __graft_entry__ as g
        g.dryrun_multichip(8)
    finally:
        sys.path.remove(repo)


def test_multihost_partition_and_gather():
    """Multi-host bake-farm partitioning (parallel/multihost.py):
    deterministic balanced splits, per-partition bakes, and the merged
    results cover every triangle with states identical to a whole-mesh
    bake of the same sub-meshes."""
    import numpy as np
    import omm_tpu as omm
    from omm_tpu.parallel import multihost as mh
    from fixtures import standard_circle

    # partitioning is deterministic and balanced by 4^subdiv cost
    costs = [4 ** 3] * 6 + [4 ** 5] * 2
    parts = mh.partition_items(costs, 3)
    assert [p.process_id for p in parts] == [0, 1, 2]
    all_idx = np.concatenate([p.item_indices for p in parts])
    assert np.array_equal(np.sort(all_idx), np.arange(len(costs)))
    assert mh.partition_items(costs, 1)[0].item_indices.shape == (8,)

    # single-process init is a no-op
    assert mh.init_distributed() == (0, 1)

    # two-"host" bake of a 4-quad mesh == per-partition reference bakes
    tex = omm.Texture([standard_circle(32, 32)], omm.TextureFormat.FP32)
    rng = np.random.RandomState(0)
    uvs, idxb = [], []
    for q in range(4):
        b = rng.rand(2).astype(np.float32) * 0.4
        base = len(uvs)
        uvs += [b, b + [0, 0.3], b + [0.3, 0], b + [0.3, 0.3]]
        idxb += [base, base + 1, base + 2, base + 3, base + 1, base + 2]
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=np.asarray(uvs, np.float32),
        index_buffer=np.asarray(idxb, np.uint32), index_count=len(idxb),
        max_subdivision_level=3)
    tri_count = len(idxb) // 3
    parts = mh.partition_items([4 ** 3] * tri_count, 2)
    blobs = [mh.bake_partition(desc, p, backend="numpy") for p in parts]
    results = mh.gather_results(blobs)
    assert len(results) == 2
    covered = 0
    for p, r in zip(parts, results):
        refs = np.asarray(r.index_buffer)
        assert len(refs) == len(p.item_indices)
        covered += len(refs)
        # partition result equals an independent bake of the sub-mesh
        idx = np.asarray(desc.index_buffer).reshape(-1, 3)[p.item_indices]
        sub = omm.BakeInputDesc(
            texture=tex, tex_coords=desc.tex_coords,
            index_buffer=idx.reshape(-1).astype(np.uint32),
            index_count=idx.size, max_subdivision_level=3)
        want = omm.bake(sub)
        assert np.array_equal(r.array_data, want.array_data)
    assert covered == tri_count


def test_bake_with_mesh_matches_single_device():
    """Public API multi-chip: omm.bake(desc, backend='pallas', mesh=mesh)
    shards eligible work items over the mesh (full two-phase pipeline
    under shard_map) and must produce results byte-identical to the
    meshless bake — including a mixed mesh with a degenerate (line)
    triangle and duplicate UVs that stay on the single-device flow."""
    import jax
    import omm_tpu as omm
    from fixtures import standard_circle

    tex = omm.Texture([standard_circle(128, 128)], omm.TextureFormat.FP32)
    rng = np.random.RandomState(8)
    uvs, idxb = [], []
    for q in range(5):
        b = rng.rand(2).astype(np.float32) * 0.4
        base = len(uvs)
        uvs += [b, b + [0.05, 0.45], b + [0.45, 0.4]]
        idxb += [base, base + 1, base + 2]
    # a degenerate (line) triangle — ineligible, single-device path
    base = len(uvs)
    uvs += [np.array([0.2, 0.2], np.float32),
            np.array([0.4, 0.4], np.float32),
            np.array([0.6, 0.6], np.float32)]
    idxb += [base, base + 1, base + 2]
    # an exact duplicate of triangle 0 — dedup must still collapse it
    idxb += [0, 1, 2]
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=np.asarray(uvs, np.float32),
        index_buffer=np.asarray(idxb, np.uint32), index_count=len(idxb),
        max_subdivision_level=5, dynamic_subdivision_scale=0.0)

    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("omm",))
    got = omm.bake(desc, backend="pallas", mesh=mesh)
    want = omm.bake(desc, backend="numpy")
    assert np.array_equal(got.array_data, want.array_data)
    assert np.array_equal(np.asarray(got.index_buffer),
                          np.asarray(want.index_buffer))
    assert got.index_format == want.index_format
    assert omm.get_stats(got) == omm.get_stats(want)


def test_bake_with_mesh_wrapped_uvs():
    """Multi-repeat Wrap UVs are mesh-shardable too (the periodic fast
    path composes with shard_map): byte-identical to the meshless
    numpy bake."""
    import jax
    import omm_tpu as omm
    from fixtures import standard_circle

    tex = omm.Texture([standard_circle(64, 64)], omm.TextureFormat.FP32)
    rng = np.random.RandomState(9)
    uvs, idxb = [], []
    for q in range(8):
        b = rng.rand(2).astype(np.float32) * 2.0 + 1.0
        base = len(uvs)
        uvs += [b, b + [0.1, 1.2], b + [1.3, 1.1]]
        idxb += [base, base + 1, base + 2]
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=np.asarray(uvs, np.float32),
        runtime_sampler=omm.SamplerDesc(
            addressing_mode=omm.TextureAddressMode.Wrap,
            filter=omm.TextureFilterMode.Linear),
        index_buffer=np.asarray(idxb, np.uint32), index_count=len(idxb),
        max_subdivision_level=5, dynamic_subdivision_scale=0.0)

    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("omm",))
    got = omm.bake(desc, backend="pallas", mesh=mesh)
    want = omm.bake(desc, backend="numpy")
    assert np.array_equal(got.array_data, want.array_data)
    assert np.array_equal(np.asarray(got.index_buffer),
                          np.asarray(want.index_buffer))
    assert omm.get_stats(got) == omm.get_stats(want)


def test_bake_with_mesh_more_items_than_sharded():
    """Regression: the sharded classify path must not clobber the item
    selection mask.  Two mesh-eligible triangles pad to one 8-device
    shard batch (8 entries) while the item list is longer (2 eligible +
    9 degenerate) — a clobbered mask either indexes out of bounds or
    silently skips items in every downstream classify loop."""
    import jax
    import omm_tpu as omm
    from fixtures import standard_circle

    tex = omm.Texture([standard_circle(128, 128)], omm.TextureFormat.FP32)
    uvs, idxb = [], []
    for b in ([0.1, 0.1], [0.5, 0.45]):
        base = len(uvs)
        uvs += [np.array(b, np.float32),
                np.array(b, np.float32) + [0.05, 0.4],
                np.array(b, np.float32) + [0.4, 0.35]]
        idxb += [base, base + 1, base + 2]
    for k in range(9):  # degenerate (line) triangles: single-device path
        base = len(uvs)
        t = 0.05 + 0.08 * k
        uvs += [np.array([t, t], np.float32),
                np.array([t + 0.2, t + 0.2], np.float32),
                np.array([t + 0.4, t + 0.4], np.float32)]
        idxb += [base, base + 1, base + 2]
    desc = omm.BakeInputDesc(
        texture=tex, tex_coords=np.asarray(uvs, np.float32),
        index_buffer=np.asarray(idxb, np.uint32), index_count=len(idxb),
        max_subdivision_level=5, dynamic_subdivision_scale=0.0)

    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("omm",))
    got = omm.bake(desc, backend="pallas", mesh=mesh)
    want = omm.bake(desc, backend="numpy")
    assert np.array_equal(got.array_data, want.array_data)
    assert np.array_equal(np.asarray(got.index_buffer),
                          np.asarray(want.index_buffer))
    assert omm.get_stats(got) == omm.get_stats(want)
