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
