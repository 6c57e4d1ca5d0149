"""Real multi-process bake-farm test (parallel/multihost.py over DCN).

Spawns two OS processes that form a jax.distributed cluster (CPU
platform, localhost coordinator — the DCN stand-in), each bakes its
deterministic partition of a shared mesh, and ships the serialized blob
back through the filesystem (the transport is opaque bytes, exactly what
travels over DCN / an object store on a real pod).  The parent gathers
and checks the merged results against an in-process whole-flow bake.

The reference has no distributed execution at all (SURVEY.md §2.9); this
is the TPU-native scale-out path's integration test.
"""
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from omm_tpu.parallel import multihost as mh

pid = int(sys.argv[1]); coord = sys.argv[2]; outdir = sys.argv[3]
got = mh.init_distributed(coordinator_address=coord, num_processes=2,
                          process_id=pid)
assert got == (pid, 2), got
assert jax.process_count() == 2

import omm_tpu as omm
sys.path.insert(0, os.path.join({repo!r}, "tests"))
from fixtures import standard_circle

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

costs = [4 ** 3] * 8
parts = mh.partition_items(costs, 2)   # identical on every process
blob = mh.bake_partition(desc, parts[pid], backend="numpy")
with open(os.path.join(outdir, f"blob{{pid}}.bin"), "wb") as f:
    f.write(blob)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_WORKER4 = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from omm_tpu.parallel import multihost as mh

pid = int(sys.argv[1]); coord = sys.argv[2]; outdir = sys.argv[3]
got = mh.init_distributed(coordinator_address=coord, num_processes=4,
                          process_id=pid)
assert got == (pid, 4), got
assert jax.process_count() == 4
assert jax.local_device_count() == 2, jax.local_devices()
assert jax.device_count() == 8, jax.devices()

import omm_tpu as omm
sys.path.insert(0, os.path.join({repo!r}, "tests"))
from fixtures import standard_circle
from test_multihost_procs import farm_mesh_desc

desc = farm_mesh_desc(omm, standard_circle)
costs = [4 ** 3] * 16
parts = mh.partition_items(costs, 4)   # identical on every process
blob = mh.bake_partition(desc, parts[pid], backend="numpy")

# one real DCN collective over the 4x2 global device mesh: every host
# learns the farm's per-partition desc counts (the histogram-merge op)
from omm_tpu import serialize as ser
mine = len(ser.deserialize(blob).result_descs[0].desc_array)
from jax.experimental import multihost_utils
counts = multihost_utils.process_allgather(
    np.array([mine], np.int32), tiled=True)
assert counts.shape == (4,), counts.shape
assert int(counts[pid]) == mine

with open(os.path.join(outdir, f"blob{{pid}}.bin"), "wb") as f:
    f.write(blob)
with open(os.path.join(outdir, f"counts{{pid}}.txt"), "w") as f:
    f.write(",".join(str(int(c)) for c in counts))

# Two-level composition (SURVEY 5.8): the SAME partition re-baked with
# this host's LOCAL 2-device mesh sharding the classification over "ICI"
# while the partition boundary stays the DCN unit.  Local-only mesh =>
# every collective stays within the host.
from omm_tpu.parallel import shard as psh
mesh_local = psh.make_mesh(jax.local_devices())
assert mesh_local.devices.size == 2
blob_mesh = mh.bake_partition(desc, parts[pid], backend="pallas",
                              mesh=mesh_local)
with open(os.path.join(outdir, f"blobmesh{{pid}}.bin"), "wb") as f:
    f.write(blob_mesh)

# EXACT farm: classify only this process's work items of the GLOBAL desc
# (sharded over the local 2-device mesh) and ship the packed states; the
# parent's merge_exact replays the global tail — byte-identical to a
# single-process bake (the reference's global dedup semantics).
costs_it = mh.item_costs(desc)
parts_x = mh.partition_items(costs_it.tolist(), 4)
xblob = mh.classify_partition(desc, parts_x[pid], backend="pallas",
                              mesh=mesh_local)
with open(os.path.join(outdir, f"xblob{{pid}}.bin"), "wb") as f:
    f.write(xblob)
"""


def farm_mesh_desc(omm, standard_circle):
    """16-triangle mesh (8 quads) over the shared circle texture; quads
    alternate between two exact UV rects so identical OMMs recur across
    the 4 partitions (cross-partition duplicates = measurable dedup
    loss), plus 4 unique jittered quads."""
    tex = omm.Texture([standard_circle(32, 32)], omm.TextureFormat.FP32)
    rects = [np.array([0.1, 0.1], np.float32),
             np.array([0.45, 0.45], np.float32)]
    rng = np.random.RandomState(7)
    uvs, idxb = [], []
    for q in range(8):
        b = rects[q % 2] if q < 4 else rng.rand(2).astype(np.float32) * 0.4
        base = len(uvs)
        uvs += [b, b + [0, 0.3], b + [0.3, 0], b + [0.3, 0.3]]
        idxb += [base, base + 1, base + 2, base + 3, base + 1, base + 2]
    return omm.BakeInputDesc(
        texture=tex, tex_coords=np.asarray(uvs, np.float32),
        index_buffer=np.asarray(idxb, np.uint32), index_count=len(idxb),
        max_subdivision_level=3)


def _assert_results_byte_equal(got, want):
    """Full BakeResult byte equality: the exact-farm contract."""
    from omm_tpu.baker import Baker

    assert got.index_format == want.index_format
    assert np.array_equal(got.array_data, want.array_data)
    assert got.desc_array == want.desc_array
    assert got.desc_array_histogram == want.desc_array_histogram
    assert got.index_histogram == want.index_histogram
    assert np.array_equal(np.asarray(got.index_buffer),
                          np.asarray(want.index_buffer))
    bk = Baker()
    assert bk.serialize(result_descs=[got]) == bk.serialize(
        result_descs=[want])


def test_exact_farm_merge_inprocess():
    """classify_partition + merge_exact (no subprocesses): 3 partitions
    over the work-item costs, merged output byte-identical to the
    single-process bake — including a near-duplicate-detection desc whose
    LSH merge order only a GLOBAL tail can reproduce."""
    import omm_tpu as omm
    from omm_tpu.parallel import multihost as mh
    from omm_tpu.types import BakeFlags
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from fixtures import standard_circle

    desc = farm_mesh_desc(omm, standard_circle)
    desc.bake_flags |= BakeFlags.EnableNearDuplicateDetection
    costs = mh.item_costs(desc)
    assert costs.ndim == 1 and (costs > 0).all()
    parts = mh.partition_items(costs.tolist(), 3)
    blobs = [mh.classify_partition(desc, p, backend="numpy")
             for p in parts]
    merged = mh.merge_exact(desc, blobs)
    _assert_results_byte_equal(merged, omm.bake(desc, backend="numpy"))

    # jax-classified partitions merge to the same bytes (engine-blind)
    blob0_jax = mh.classify_partition(desc, parts[0], backend="jax")
    merged2 = mh.merge_exact(desc, [blob0_jax] + blobs[1:])
    _assert_results_byte_equal(merged2, merged)

    # a missing partition must fail loudly, not bake garbage
    import pytest
    with pytest.raises(ValueError, match="missing states"):
        mh.merge_exact(desc, blobs[:-1])


def test_four_process_two_device_bake_farm(tmp_path):
    """4 jax.distributed processes x 2 virtual CPU devices each (the DCN
    rehearsal VERDICT asked for): partitioned bakes + a process_allgather
    over the 8-device global mesh, then cross-partition dedup-loss
    accounting asserted against the DedupLossReport bound."""
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker4.py"
    script.write_text(_WORKER4.format(repo=REPO))

    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(p), coord, str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for p in range(4)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    import omm_tpu as omm
    from omm_tpu.parallel import multihost as mh
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from fixtures import standard_circle

    blobs = [(tmp_path / f"blob{p}.bin").read_bytes() for p in range(4)]
    results = mh.gather_results(blobs)
    assert len(results) == 4

    # every host saw the same farm-wide counts through the collective
    per = [len(r.desc_array) for r in results]
    for p in range(4):
        got = [int(c) for c in
               (tmp_path / f"counts{p}.txt").read_text().split(",")]
        assert got == per

    # oracle: identical per-partition bakes in-process
    desc = farm_mesh_desc(omm, standard_circle)
    parts = mh.partition_items([4 ** 3] * 16, 4)
    want = mh.gather_results(
        [mh.bake_partition(desc, parts[p], backend="numpy")
         for p in range(4)])
    for got, ref in zip(results, want):
        assert np.array_equal(got.array_data, ref.array_data)
        assert np.array_equal(np.asarray(got.index_buffer),
                              np.asarray(ref.index_buffer))

    # two-level composition: the mesh-sharded (DCN partition x local
    # 2-device ICI mesh) farm results must equal the single-process
    # meshless oracle byte-for-byte — sharding at either level is
    # invisible in the output (the bit-exactness contract)
    blobs_mesh = [(tmp_path / f"blobmesh{p}.bin").read_bytes()
                  for p in range(4)]
    results_mesh = mh.gather_results(blobs_mesh)
    for got, ref in zip(results_mesh, want):
        assert np.array_equal(got.array_data, ref.array_data)
        assert np.array_equal(np.asarray(got.index_buffer),
                              np.asarray(ref.index_buffer))

    # dedup-loss accounting: repeated UV rects across partitions mean a
    # global dedup would have stored fewer OMMs; the report's loss must
    # match the direct global-bake comparison and respect the documented
    # exact-dedup bound
    report = mh.dedup_loss(results)
    assert report.per_partition == per
    global_result = omm.bake(desc, backend="numpy")
    assert report.global_distinct == len(global_result.desc_array)
    assert 0 < report.loss <= report.bound
    assert report.loss == sum(per) - len(global_result.desc_array)

    # EXACT farm: the merged result of the 4 processes' classify-only
    # partitions (each sharded over its local 2-device mesh) must be
    # byte-identical to the single-process bake — global dedup semantics
    # preserved across DCN, and the dedup-loss canary reads 0
    xblobs = [(tmp_path / f"xblob{p}.bin").read_bytes() for p in range(4)]
    merged = mh.merge_exact(desc, xblobs)
    _assert_results_byte_equal(merged, global_result)
    xreport = mh.dedup_loss([merged])
    assert xreport.loss == 0


def test_two_process_bake_farm(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO))

    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(p), coord, str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for p in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    # gather: the parent is the farm coordinator consuming the blobs
    import omm_tpu as omm
    from omm_tpu.parallel import multihost as mh
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from fixtures import standard_circle

    blobs = [(tmp_path / f"blob{p}.bin").read_bytes() for p in range(2)]
    results = mh.gather_results(blobs)
    assert len(results) == 2

    # oracle: the identical per-partition bakes run in-process
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
    parts = mh.partition_items([4 ** 3] * 8, 2)
    want = mh.gather_results(
        [mh.bake_partition(desc, parts[p], backend="numpy")
         for p in range(2)])

    for got, ref in zip(results, want):
        assert np.array_equal(got.array_data, ref.array_data)
        assert np.array_equal(np.asarray(got.index_buffer),
                              np.asarray(ref.index_buffer))
