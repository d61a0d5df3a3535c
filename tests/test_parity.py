"""Golden-image parity vs the reference's scalar C++ renderer.

Fixtures in tests/golden/ are rendered by the *reference itself*
(tools/gen_golden.py compiles /root/reference/Cpp/Source scalar +
single-thread and dumps raw backbuffers).  Our render/parity.py replays the
CPU semantics draw-for-draw (per-row RNG threading, rejection samplers,
recursive float association, the depth-10 tail).

What "parity" can mean here: XLA-CPU's vectorized sin/cos differ from
glibc's sinf/cosf by up to ~1000 ulp on ~55% of inputs (measured), and a
path tracer is chaotic -- a 1-ulp direction difference grows each bounce
and eventually flips a comparison (rejection-loop accept, Fresnel test),
after which that row's RNG stream is decorrelated and later pixels are
*different valid samples* of the same integral.  The gates therefore check:

  1. prefix exactness -- the first pixels of each row (fresh RNG stream)
     match tightly; any systematic math bug fails here immediately;
  2. structure -- the majority of pixels stay within drift tolerance and
     ray counts agree to ~2%;
  3. distribution -- 16-frame progressive averages agree block-wise
     (different valid samples converge to the same mean).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import load_golden

from toypathtracer_tpu import RenderConfig, make_scene
from toypathtracer_tpu.config import FLAG_PROGRESSIVE
from toypathtracer_tpu.render.parity import render_frame_parity


@pytest.fixture(scope="module")
def tiny_result(big_scene):
    cfg = RenderConfig(width=64, height=36)
    img, rays = render_frame_parity(big_scene, cfg, jnp.int32(0))
    return np.asarray(img), int(rays)


def test_first_pixel_exact(tiny_result):
    """Pixel (0,0) consumes the freshest RNG stream: must match the C++
    reference to float-rounding noise."""
    g = load_golden("tiny_f1")
    a, _ = tiny_result
    np.testing.assert_allclose(a[0, 0], g["image"][0, 0], atol=2e-5)


def test_row_prefix_fidelity(tiny_result):
    """Each row starts a fresh RNG stream; its first pixel reflects a full
    10-bounce trace with ~no accumulated drift."""
    g = load_golden("tiny_f1")
    a, _ = tiny_result
    col0 = np.abs(a[:, 0] - g["image"][:, 0]).max(axis=-1)
    assert np.median(col0) < 1e-3, f"col0 median {np.median(col0)}"


def test_single_frame_structure(tiny_result):
    g = load_golden("tiny_f1")
    a, rays = tiny_result
    b = g["image"]
    d = np.abs(a - b).max(axis=-1)
    assert np.median(d) < 0.02, f"median {np.median(d)}"
    assert (d < 1e-3).mean() > 0.25, f"tight frac {(d < 1e-3).mean()}"
    assert abs(rays - int(g["rays"])) / int(g["rays"]) < 0.02


def test_progressive_16frame_distribution(big_scene):
    """16-frame progressive averages converge to the same integral: chaos
    decorrelation averages out, systematic radiometric bugs would not."""
    g = load_golden("tiny_f16")
    cfg = RenderConfig(width=64, height=36)
    accum = jnp.zeros((36, 64, 3), jnp.float32)
    total = 0
    for f in range(16):
        img, rays = render_frame_parity(big_scene, cfg, jnp.int32(f))
        fac = jnp.float32(f / (f + 1.0))
        accum = accum * fac + img * (1.0 - fac)
        total += int(rays)
    a = np.asarray(accum)
    b = g["image"]
    # Tonemap before comparing: emissive-edge pixels have variance ~ the
    # emission value (up to 20); sqrt compresses them to the same scale as
    # the rest of the image, making block means variance-comparable.
    ta = np.sqrt(np.clip(a, 0, None))
    tb = np.sqrt(np.clip(b, 0, None))
    ab = ta.reshape(9, 4, 16, 4, 3).mean(axis=(1, 3))
    bb = tb.reshape(9, 4, 16, 4, 3).mean(axis=(1, 3))
    assert np.abs(ab - bb).mean() < 0.02, np.abs(ab - bb).mean()
    assert np.abs(ab - bb).max() < 0.20, np.abs(ab - bb).max()
    assert abs(total - int(g["rays"])) / int(g["rays"]) < 0.02
