"""XorShift32 RNG and sampler unit tests against an independent pure-Python
oracle implementing the reference bit-exactly (Maths.cpp:5-18,
ComputeShader.hlsl:3-44).

All JAX-side sequences are produced by single jitted lax.scan calls (one
dispatch per test) -- per-op dispatch is expensive on the CI host.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from toypathtracer_tpu.ops import tracecore as tc

M32 = 0xFFFFFFFF


def py_xorshift32(state):
    x = state & M32
    x ^= (x << 13) & M32
    x ^= x >> 17
    x ^= (x << 15) & M32
    return x & M32


def py_rand01(state):
    s = py_xorshift32(state)
    return s, (s & 0xFFFFFF) / 16777216.0


@partial(jax.jit, static_argnames=("n", "fn_name"))
def _scan_sampler(seed, n, fn_name):
    fn = dict(
        xorshift=lambda s: (tc.xorshift32(s), tc.xorshift32(s)),
        rand01=tc.rand01,
        unit_vector=tc.random_unit_vector,
        disk=tc.random_in_unit_disk,
        sphere=tc.random_in_unit_sphere,
        disk_rej=tc.random_in_unit_disk_reject,
        sphere_rej=tc.random_in_unit_sphere_reject,
    )[fn_name]

    def step(s, _):
        s2, v = fn(s)
        return s2, (s2, v)

    _, (states, vals) = jax.lax.scan(step, jnp.uint32(seed), None, length=n)
    return states, vals


def test_xorshift32_sequence():
    states, _ = _scan_sampler(12345, 100, "xorshift")
    s = 12345
    for i in range(100):
        s = py_xorshift32(s)
        assert int(states[i]) == s


def test_rand01_matches_oracle():
    states, vals = _scan_sampler(99991, 50, "rand01")
    s = 99991
    for i in range(50):
        s, want = py_rand01(s)
        assert int(states[i]) == s
        assert abs(float(vals[i]) - want) < 1e-7


def test_rand01_range():
    _, vals = _scan_sampler(7, 1000, "rand01")
    vals = np.asarray(vals)
    assert (vals >= 0).all() and (vals < 1).all()
    assert 0.4 < vals.mean() < 0.6


def test_seed_pixels_formula():
    # (x*1973 + y*9277 + frame*26699) | 1  (ComputeShader.hlsl:380)
    x = jnp.array([[3]], jnp.int32)
    y = jnp.array([[5]], jnp.int32)
    got = tc.seed_pixels(x, y, 7)
    want = ((3 * 1973 + 5 * 9277 + 7 * 26699) | 1) & M32
    assert int(got[0, 0]) == want


def test_unit_vector_matches_oracle():
    states, vals = _scan_sampler(424242, 20, "unit_vector")
    vx, vy, vz = (np.asarray(v) for v in vals)
    s = 424242
    for i in range(20):
        s, r1 = py_rand01(s)
        s, r2 = py_rand01(s)
        z = r1 * 2 - 1
        a = r2 * 2 * 3.1415926
        r = math.sqrt(1 - z * z)
        want = (r * math.cos(a), r * math.sin(a), z)
        got = (vx[i], vy[i], vz[i])
        assert int(states[i]) == s
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert abs(sum(c * c for c in got) - 1.0) < 1e-5


def test_disk_sample_in_disk_and_draw_count():
    states, (x, y) = _scan_sampler(31337, 20, "disk")
    s = 31337
    for i in range(20):
        # exactly two draws per sample (closed form, hlsl:18-24)
        s, _ = py_rand01(s)
        s, _ = py_rand01(s)
        assert int(states[i]) == s
        assert float(x[i]) ** 2 + float(y[i]) ** 2 <= 1.0 + 1e-6


def test_sphere_sample_in_sphere():
    _, (x, y, z) = _scan_sampler(777, 50, "sphere")
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2 + np.asarray(z) ** 2
    assert (r2 <= 1.0 + 1e-6).all()


def test_rejection_disk_matches_cpu_oracle():
    """Rejection sampler consumes exactly the CPU reference's draw sequence
    (Maths.cpp:20-28).  The reference writes
    float3(RandomFloat01(state), RandomFloat01(state), 0) and g++ (which
    builds the golden oracle) evaluates constructor arguments
    RIGHT-to-LEFT, so the first draw lands in .y (verified against a
    per-sample printf trace of the compiled oracle; see
    tracecore.random_in_unit_disk_reject)."""
    def py_disk(s):
        while True:
            s, r1 = py_rand01(s)
            s, r2 = py_rand01(s)
            px, py_ = r2 * 2 - 1, r1 * 2 - 1
            if px * px + py_ * py_ < 1.0:
                return s, (px, py_)

    states, (x, y) = _scan_sampler(5150, 20, "disk_rej")
    s = 5150
    for i in range(20):
        s, (wx, wy) = py_disk(s)
        assert int(states[i]) == s
        np.testing.assert_allclose([float(x[i]), float(y[i])], [wx, wy],
                                   atol=1e-6)


def test_rejection_sphere_matches_cpu_oracle():
    """Draw order .z, .y, .x -- g++ right-to-left constructor-argument
    evaluation, as in test_rejection_disk_matches_cpu_oracle."""
    def py_sph(s):
        while True:
            s, r1 = py_rand01(s)
            s, r2 = py_rand01(s)
            s, r3 = py_rand01(s)
            p = (r3 * 2 - 1, r2 * 2 - 1, r1 * 2 - 1)
            if sum(c * c for c in p) < 1.0:
                return s, p

    states, (x, y, z) = _scan_sampler(8888, 20, "sphere_rej")
    s = 8888
    for i in range(20):
        s, want = py_sph(s)
        assert int(states[i]) == s
        got = [float(x[i]), float(y[i]), float(z[i])]
        np.testing.assert_allclose(got, want, atol=1e-6)
