"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The driver benches on real TPU; tests validate numerics + sharding on host
(multi-chip hardware is not available in this environment).  The driver env
pins JAX_PLATFORMS to the TPU tunnel, so override it here unless the user
asks for a specific platform via OMM_TEST_PLATFORM.
"""
import os

platform = os.environ.get("OMM_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize registers (and pins) the TPU-tunnel
# backend at interpreter start, so the env var alone is too late — force
# the platform through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", platform)

# Persistent compilation cache: the suite's wall time is dominated by
# CPU jit compiles of the big engine signatures; caching them across
# runs cuts e.g. test_twophase from ~250 s to ~72 s.  Keys are
# HLO-content hashes, so code changes re-compile automatically.
#
# The cache stores XLA:CPU AOT results compiled for THIS host's CPU
# features, but the build host can change between rounds — XLA then
# loads the mismatched code anyway ("This could lead to execution
# errors such as SIGILL"; observed: a segfault inside the cache writer
# and wrong bake results mid-suite).  Guard with a CPU fingerprint
# file: wipe the cache when the host changed.
if platform == "cpu" and "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    import hashlib
    import shutil

    _cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        with open("/proc/cpuinfo") as f:
            _flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:  # pragma: no cover - non-Linux
        import platform as _plat
        _flags = _plat.processor()
    _fp = hashlib.sha256(_flags.encode()).hexdigest()[:16]
    _fp_file = os.path.join(_cache, ".host_fingerprint")
    try:
        with open(_fp_file) as f:
            _stale = f.read().strip() != _fp
    except OSError:
        _stale = os.path.isdir(_cache)  # cache without fingerprint
    if _stale:
        shutil.rmtree(_cache, ignore_errors=True)
    os.makedirs(_cache, exist_ok=True)
    with open(_fp_file, "w") as f:
        f.write(_fp)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
