"""The numpy backend must work when NO jax backend can initialize.

Importing the package used to die inside kernels/pallas_classify.py,
whose module level called jax.default_backend() (= initialize the device
client) to pick the fp-fence policy; with the TPU tunnel unreachable the
import raised — or hung on the remote connection — long before any
device work was requested.  The fence is now resolved lazily on first
kernel use (pallas_classify.kernel_fence).

The subprocess pins JAX_PLATFORMS to a platform that does not exist, so
ANY backend-initializing call raises (or, with a wedged remote tunnel
plugin, hangs past the timeout); the bake must finish fast without ever
making one.

Reference analog: the CPU baker (bake_cpu_impl.cpp) never touches the
GPU; ommCpuBake works on a machine with no GPU driver at all.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import sys
import numpy as np
sys.path.insert(0, %r)
import omm_tpu as omm
h = w = 64
j, i = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
alpha = (np.hypot(i - 32, j - 32) < 20).astype(np.float32)
tex = omm.Texture([alpha], omm.TextureFormat.FP32)
desc = omm.BakeInputDesc(
    texture=tex,
    tex_coords=np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.float32),
    index_buffer=np.array([0, 1, 2, 3, 1, 2], np.uint32), index_count=6,
    max_subdivision_level=4)
res = omm.bake(desc, backend="numpy")
assert len(res.desc_array) == 2, res.desc_array
print("OK")
""" % (REPO,)


def test_numpy_bake_without_jax_backend():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "omm_no_such_platform"
    env.pop("JAX_PLATFORM_NAME", None)
    try:
        p = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                           capture_output=True, text=True, timeout=120)
    except subprocess.TimeoutExpired:
        raise AssertionError(
            "numpy bake blocked on jax backend initialization")
    assert p.returncode == 0, p.stderr[-2000:]
    assert "OK" in p.stdout, p.stdout
