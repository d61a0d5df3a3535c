"""Image IO + CLI surface tests.

sRGB encode mirrors the reference exactly: the C# TGA dump's
`1.055x^(1/2.4)-0.055` curve (reference: Cs/Program.cs:40-47) and the
uncompressed 24-bit bottom-up BGR TGA container (Program.cs:49-59)."""

import os
import struct

import numpy as np

from toypathtracer_tpu import io as image_io


def test_srgb_curve_reference_points():
    lin = np.array([[[0.0, 0.0031308, 1.0]]], dtype=np.float32)
    srgb = image_io.linear_to_srgb(lin)
    np.testing.assert_allclose(srgb[0, 0, 0], 0.0, atol=1e-7)
    np.testing.assert_allclose(srgb[0, 0, 1], 0.0031308 * 12.92, rtol=1e-5)
    np.testing.assert_allclose(srgb[0, 0, 2], 1.0, rtol=1e-5)
    # mid-gray: 0.5 -> ~0.7354
    mid = image_io.linear_to_srgb(np.full((1, 1, 3), 0.5, np.float32))
    np.testing.assert_allclose(mid, 0.73536, rtol=1e-3)


def test_tga_roundtrip(tmp_path):
    img = np.zeros((4, 8, 3), np.float32)
    img[0, 0] = [1.0, 0.0, 0.0]  # bottom-left red (backbuffer layout)
    path = str(tmp_path / "out.tga")
    image_io.write_tga(path, img)
    raw = open(path, "rb").read()
    # header: type 2 (uncompressed truecolor), 8x4, 32bpp BGRA with
    # alpha=255 -- byte-for-byte the reference CLI (Cs/Program.cs:43-55)
    assert raw[2] == 2
    w, h = struct.unpack("<HH", raw[12:16])
    assert (w, h) == (8, 4)
    assert raw[16] == 32
    px = np.frombuffer(raw[18:], np.uint8).reshape(4, 8, 4)
    # TGA rows are bottom-up, BGRA: bottom-left pixel is our red pixel
    assert tuple(px[0, 0]) == (0, 0, 255, 255)
    assert tuple(px[1, 1]) == (0, 0, 0, 255)


def test_to_u8_flips_vertically():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = 1.0  # bottom row in backbuffer
    u8 = image_io.to_u8(img)
    assert u8[1, 0, 0] == 255  # ends up in the bottom of the top-down array
    assert u8[0, 0, 0] == 0


def test_cli_headless_render(tmp_path, capsys):
    from toypathtracer_tpu.cli import main
    out = str(tmp_path / "cli.tga")
    rc = main(["--width", "64", "--height", "8", "--spp", "1",
               "--max-depth", "3", "--frames", "2", "--small",
               "--backend", "jnp", "--output", out])
    assert rc == 0
    assert os.path.exists(out)
    captured = capsys.readouterr().out
    assert "Mrays/s" in captured and "frames 2" in captured


def test_cli_resume_matches_uninterrupted(tmp_path, capsys):
    """--save-state/--resume: 2 frames + resume 2 more == 4 straight frames
    (progressive accumulation is the checkpointable state, SURVEY.md #5)."""
    from toypathtracer_tpu.cli import main
    common = ["--width", "64", "--height", "8", "--spp", "1",
              "--max-depth", "3", "--small", "--backend", "jnp"]
    state = str(tmp_path / "state.npz")
    a = str(tmp_path / "a.tga")
    b = str(tmp_path / "b.tga")
    c = str(tmp_path / "c.tga")

    assert main(common + ["--frames", "2", "--save-state", state,
                          "--output", a]) == 0
    assert main(common + ["--frames", "2", "--resume", state,
                          "--output", b]) == 0
    assert "frames 4" in capsys.readouterr().out  # counter resumed at 3
    assert main(common + ["--frames", "4", "--output", c]) == 0

    resumed = np.fromfile(b, np.uint8)
    straight = np.fromfile(c, np.uint8)
    np.testing.assert_array_equal(resumed, straight)


def test_render_config_validation():
    """The fused loop bit-packs depth (8 bits), samples-started (8) and
    pixel slot (6) into one int32; RenderConfig must reject values that
    would silently corrupt lane state (ADVICE round 1, extended for
    pix_per_lane in round 2)."""
    import pytest
    from toypathtracer_tpu import RenderConfig

    RenderConfig(max_depth=255, samples_per_pixel=255, pix_per_lane=63)
    with pytest.raises(ValueError):
        RenderConfig(max_depth=256)
    with pytest.raises(ValueError):
        RenderConfig(samples_per_pixel=256)
    with pytest.raises(ValueError):
        RenderConfig(pix_per_lane=0)
    with pytest.raises(ValueError):
        RenderConfig(pix_per_lane=64)
    with pytest.raises(ValueError):
        RenderConfig(width=0)
