"""Device-numerics determinism units (kernels/levelline.exact_sqrt and
guard): the smooth-alpha scene tests catch end-to-end divergence; these
pin the primitives directly."""
import numpy as np


def test_exact_sqrt_matches_ieee_on_device():
    import jax
    import jax.numpy as jnp
    from omm_tpu.kernels.levelline import exact_sqrt

    rng = np.random.RandomState(0)
    parts = [
        (rng.rand(200000).astype(np.float32) + 1e-7) * np.float32(s)
        for s in (1e-9, 1e-3, 1.0, 1e3, 1e9)
    ]
    xs = np.concatenate(parts + [np.array(
        [0.0, 1.0, 2.0, 4.0, 0.25, 131548264.0, np.inf], np.float32)])
    got = np.asarray(jax.jit(lambda v: exact_sqrt(jnp, v))(jnp.asarray(xs)))
    want = np.sqrt(xs)
    assert np.array_equal(got, want)
    # numpy passthrough
    assert np.array_equal(exact_sqrt(np, xs), want)


def test_guard_blocks_fma_contraction():
    """The canonical contraction repro: a*w + b*u + c*v must round each
    product separately (the unfenced jit result differs on this input on
    contracting backends; the fence restores the oracle value)."""
    import jax
    import jax.numpy as jnp
    from omm_tpu.kernels.levelline import guard

    p0 = np.float32(0.27539893984794617)
    p1 = np.float32(0.27539893984794617)
    p2 = np.float32(0.5626703500747681)
    u = v = np.float32(0.03125)
    F = np.float32
    w = F(F(1.0) - u - v)
    ref = F(F(F(p0 * w) + F(p1 * u)) + F(p2 * v))

    def fenced(a, b, c, d, e, fz):
        W = jnp.float32(1.0) - d - e
        return (guard(jnp, a * W, fz) + guard(jnp, b * d, fz)
                + guard(jnp, c * e, fz))

    N = 512
    args = [jnp.full((N,), x) for x in (p0, p1, p2, u, v)]
    out = np.asarray(jax.jit(fenced)(*args, jnp.int32(0)))
    assert (out == ref).all()


def test_guard_is_identity():
    import jax
    import jax.numpy as jnp
    from omm_tpu.kernels.levelline import guard

    x = np.array([0.0, -1.5, 3.25, 1e-30, 1e30], np.float32)
    fz = jnp.int32(0)
    y = np.asarray(jax.jit(lambda v, z: guard(jnp, v, z))(jnp.asarray(x), fz))
    assert np.array_equal(x, y)
    assert guard(np, x) is x
