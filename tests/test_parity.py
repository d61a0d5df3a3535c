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


def _progressive_parity(scene, cfg, frames, flags):
    """Replay the reference's frame loop (tools/oracle_main.cpp): per frame
    UpdateTest-animate at time = f/60, render with CPU-scalar semantics,
    blend with lerpFac = f/(f+1) [x0.9 when animating, 0 when
    non-progressive] (reference: Test.cpp:271-276, Config.h:23)."""
    from toypathtracer_tpu.render.frame import scene_for_frame

    accum = np.zeros((cfg.height, cfg.width, 3), np.float32)
    per_frame_rays, total = [], 0
    for f in range(frames):
        scene_t = scene_for_frame(scene, jnp.float32(f / 60.0), flags)
        img, rays = render_frame_parity(scene_t, cfg, jnp.int32(f))
        fac = np.float32(f / (f + 1.0))
        if flags & 1:  # kFlagAnimate
            fac *= np.float32(0.9)
        if not (flags & FLAG_PROGRESSIVE):
            fac = np.float32(0.0)
        accum = accum * fac + np.asarray(img) * (np.float32(1.0) - fac)
        per_frame_rays.append(int(rays))
        total += int(rays)
    return accum, per_frame_rays, total


def _assert_structure(a, g, median_tol=0.02, tight_frac=0.25):
    """The standard chaos-aware golden gates (see module docstring)."""
    d = np.abs(a - g["image"]).max(axis=-1)
    assert np.median(d) < median_tol, f"median {np.median(d)}"
    assert (d < 1e-3).mean() > tight_frac, f"tight frac {(d < 1e-3).mean()}"
    np.testing.assert_allclose(a[0, 0], g["image"][0, 0], atol=2e-5)


@pytest.fixture(scope="module")
def small_cfg():
    return RenderConfig(width=128, height=72)


def test_small_single_frame(big_scene, small_cfg):
    """128x72 single frame vs the reference (golden small_f1)."""
    g = load_golden("small_f1")
    a, pf, total = _progressive_parity(big_scene, small_cfg, 1,
                                       FLAG_PROGRESSIVE)
    _assert_structure(a, g)
    assert abs(total - int(g["rays"])) / int(g["rays"]) < 0.02


def test_small_progressive_2frame(big_scene, small_cfg):
    """Two-frame progressive blend (lerpFac 0 then 0.5) vs the reference
    (golden small_f2; reference blend at Test.cpp:271-276, 293-294)."""
    g = load_golden("small_f2")
    a, pf, total = _progressive_parity(big_scene, small_cfg, 2,
                                       FLAG_PROGRESSIVE)
    _assert_structure(a, g)
    np.testing.assert_allclose(pf, g["per_frame_rays"], rtol=0.02)
    assert abs(total - int(g["rays"])) / int(g["rays"]) < 0.02


def test_small_animated_progressive_2frame(big_scene, small_cfg):
    """Animated + progressive: sphere motion (Test.cpp:304-308, t = f/60)
    AND the damped blend lerpFac = f/(f+1) * 0.9 (Config.h:23) vs the
    reference (golden small_anim_f2) -- the one reference behavior pair
    that only this fixture covers."""
    from toypathtracer_tpu.config import FLAG_ANIMATE
    g = load_golden("small_anim_f2")
    a, pf, total = _progressive_parity(big_scene, small_cfg, 2,
                                       FLAG_ANIMATE | FLAG_PROGRESSIVE)
    # tight_frac relaxed vs the static fixtures: animation evaluates
    # sin/cos of the frame time, whose XLA-vs-glibc ulp drift moves the
    # GEOMETRY itself -- every ray sees slightly shifted spheres, so
    # per-pixel decorrelation is stronger (measured ~0.24 tight pixels
    # vs ~0.4 static).  The median gate and ray counts stay strict.
    _assert_structure(a, g, tight_frac=0.15)
    np.testing.assert_allclose(pf, g["per_frame_rays"], rtol=0.02)
    assert abs(total - int(g["rays"])) / int(g["rays"]) < 0.02


@pytest.mark.parametrize("name,depth,max_err,flip_frac", [
    # Per-pixel-seeded short-depth goldens (the oracle's row loop
    # mechanically reseeded per pixel with the reference's own GPU
    # formula -- tools/gen_golden.py): every pixel is an independent RNG
    # stream, so a flipped branch decorrelates only itself, and bounding
    # depth bounds the flip probability.  Measured: depth 2 matches the
    # C++ oracle to max-err 6.4e-5 over the WHOLE frame with EXACT ray
    # counts; depth 3 has ~0.5% flipped pixels but q99 of 8e-6.  A
    # sub-1e-4 systematic radiometric bias anywhere in the pipeline
    # fails these gates immediately (the depth-10 median test would
    # hide it below 0.02).
    ("tiny_pp_d2_f1", 2, 2e-4, 0.0),
    ("tiny_pp_d3_f1", 3, 2e-4, 0.02),
])
def test_short_depth_full_frame_tight(big_scene, name, depth, max_err,
                                      flip_frac):
    """Short-depth full-frame parity vs a kMaxDepth-patched, per-pixel
    seeded build of the reference (Test.cpp:195-234 with kMaxDepth=2/3 and
    ComputeShader.hlsl:380 seeding, tools/gen_golden.py)."""
    from toypathtracer_tpu.render.parity import render_frame_parity_pp
    g = load_golden(name)
    assert int(g["max_depth"]) == depth and bool(g["pixel_seed"])
    cfg = RenderConfig(width=64, height=36, max_depth=depth)
    img, rays = render_frame_parity_pp(big_scene, cfg, jnp.int32(0))
    a = np.asarray(img)
    d = np.abs(a - g["image"]).max(axis=-1)
    flipped = d >= max_err
    assert flipped.mean() <= flip_frac, \
        f"flipped {flipped.mean()} (gate {flip_frac}); max {d.max()}"
    assert np.median(d) < 5e-7, f"median {np.median(d)}"
    # within-pixel branch flips change ray counts by a handful at most
    assert abs(int(rays) - int(g["rays"])) / int(g["rays"]) < 2e-3


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
