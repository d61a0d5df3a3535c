"""Native host-runtime library tests: the C++ encoders/metrics must agree
exactly with the numpy reference implementations (same curves as the
reference's Cs/Program.cs:40-47)."""

import numpy as np
import pytest

from toypathtracer_tpu import io as image_io
from toypathtracer_tpu import native

needs_native = pytest.mark.skipif(
    not native.available(), reason="libtptnative.so not built")

RNG = np.random.default_rng(7)
IMG = (RNG.uniform(-0.1, 1.3, (16, 32, 3))).astype(np.float32)


@needs_native
def test_native_srgb_matches_numpy():
    got = native.srgb_encode(IMG)
    srgb = image_io.linear_to_srgb(IMG)
    want = np.clip(srgb * 255.0 + 0.5, 0, 255).astype(np.uint8)[::-1]
    # float libm pow vs numpy pow can differ in the last ulp around the
    # 0.5 quantization boundary -- allow off-by-one on those texels
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


@needs_native
def test_native_srgb_cheap_matches_numpy():
    got = native.srgb_encode(IMG, cheap=True)
    srgb = image_io.linear_to_srgb_cheap(IMG)
    want = np.clip(srgb * 255.0 + 0.5, 0, 255).astype(np.uint8)[::-1]
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1


@needs_native
def test_native_tga_payload_order():
    got = native.srgb_encode_tga(IMG)
    top_down = native.srgb_encode(IMG)
    # TGA payload = bottom-up BGR of the same encode
    np.testing.assert_array_equal(got, top_down[::-1][:, :, ::-1])


def test_image_metrics():
    a = np.zeros((8, 8, 3), np.float32)
    b = a.copy()
    b[0, 0, 0] = 0.5
    m = native.image_metrics(a, b, tol=0.1)
    np.testing.assert_allclose(m["max_abs"], 0.5)
    assert m["n_over_tol"] == 1
    np.testing.assert_allclose(m["mean_abs"], 0.5 / a.size)


def test_progressive_blend_matches_reference_formula():
    accum = RNG.uniform(0, 1, (4, 4, 3)).astype(np.float32)
    accum[0, 0, 0] = np.nan  # NaN guard path
    frame = RNG.uniform(0, 1, (4, 4, 3)).astype(np.float32)
    out = native.progressive_blend(accum.copy(), frame, 0.75)
    prev = np.where(np.isfinite(accum), accum, 0.0)
    want = prev * 0.75 + frame * 0.25
    np.testing.assert_allclose(out, want, rtol=1e-6)
