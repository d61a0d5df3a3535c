#!/usr/bin/env python3
"""Real-TPU Pallas-vs-jnp parity artifact (VERDICT round 1 item 6 +
round 2 item 5).

Two sections:

1. single-frame raw stats: bit-equality / max-abs of one frame rendered
   by the Mosaic-COMPILED Pallas kernel vs the XLA-compiled jnp
   wavefront on the same chip.  Per-pixel diffs here are chaotic
   divergence (Mosaic and XLA round sin/cos/FMA differently; one ulp in
   a bounce direction decorrelates that pixel's whole MC path), so the
   raw max says nothing about radiometric correctness.

2. progressive_mean: the DISTRIBUTION-level gate (the round-2 missing
   piece).  16-frame progressive averages converge to the same integral
   -- chaos decorrelates and averages out; a real radiometric bug below
   the chaos floor would NOT.  Same tonemapped 4x4-block-mean gates as
   tests/test_parity.py::test_progressive_16frame_distribution applies
   against the compiled C++ oracle: blocks agree to mean < 0.02,
   max < 0.20.  This is the TPU analog of the reference's
   cross-implementation checklist (reference: readme.md:34-47).

Run inside the TPU bench window:  python tools/tpu_parity.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_toypt"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import toypathtracer_tpu as tpt
    from toypathtracer_tpu.ops.pallas_render import render_frame_pallas
    from toypathtracer_tpu.render.wavefront import render_frame

    dev = jax.devices()[0]
    cfg = tpt.RenderConfig(width=640, height=360)
    scene = tpt.make_scene(big=True)

    t0 = time.perf_counter()
    img_p, rays_p = jax.block_until_ready(
        render_frame_pallas(scene, cfg, jnp.int32(0)))
    t_pallas = time.perf_counter() - t0
    t0 = time.perf_counter()
    img_j, rays_j = jax.block_until_ready(
        render_frame(scene, cfg, jnp.int32(0)))
    t_jnp = time.perf_counter() - t0

    a = np.asarray(img_p)
    b = np.asarray(img_j)
    diff = np.abs(a - b)
    bit_equal = bool((a == b).all())
    out = {
        "device": str(dev.device_kind),
        "platform": str(dev.platform),
        "config": {"width": cfg.width, "height": cfg.height,
                   "spp": cfg.samples_per_pixel, "depth": cfg.max_depth},
        "rays_pallas": int(rays_p),
        "rays_jnp": int(rays_j),
        "rays_equal": bool(int(rays_p) == int(rays_j)),
        "bit_equal": bit_equal,
        "max_abs_diff": float(diff.max()),
        "mean_abs_diff": float(diff.mean()),
        "frac_pixels_equal": float((diff.max(axis=-1) == 0.0).mean()),
        "compile_plus_run_s": {"pallas": round(t_pallas, 2),
                               "jnp": round(t_jnp, 2)},
    }
    # --- distribution gate: 16-frame progressive means, block-compared
    # with the same tolerances tests/test_parity.py applies vs the C++
    # oracle.  64x36 and 4x4 blocks exactly like that test, so the
    # tolerances transfer.
    pcfg = tpt.RenderConfig(width=64, height=36)

    def progressive(render):
        @jax.jit
        def run(scene):
            accum0 = jnp.zeros((pcfg.height, pcfg.width, 3), jnp.float32)

            def step(accum, i):
                img, rays = render(scene, pcfg, i)
                fac = i.astype(jnp.float32) / (i.astype(jnp.float32) + 1.0)
                return accum * fac + img * (1.0 - fac), rays

            return jax.lax.scan(step, accum0,
                                jnp.arange(16, dtype=jnp.int32))

        accum, rays = run(scene)
        return np.asarray(accum), int(np.asarray(rays).sum())

    pa, rays_pp = progressive(render_frame_pallas)
    pb, rays_pj = progressive(render_frame)
    ta = np.sqrt(np.clip(pa, 0, None))
    tb = np.sqrt(np.clip(pb, 0, None))
    ab = ta.reshape(9, 4, 16, 4, 3).mean(axis=(1, 3))
    bb = tb.reshape(9, 4, 16, 4, 3).mean(axis=(1, 3))
    block_mean = float(np.abs(ab - bb).mean())
    block_max = float(np.abs(ab - bb).max())
    # Ray counts on REAL hardware are near-equal, not equal: a one-ulp
    # Mosaic-vs-XLA difference in a bounce direction changes that path's
    # depth, so counts drift by the chaos rate (measured 0.004% at 640x360;
    # interpret mode is exactly equal, tests/test_pallas.py).  Gate at
    # 0.05%.
    rays_rel = abs(rays_pp - rays_pj) / max(rays_pj, 1)
    out["progressive_mean"] = {
        "frames": 16,
        "config": {"width": pcfg.width, "height": pcfg.height,
                   "spp": pcfg.samples_per_pixel, "depth": pcfg.max_depth},
        "rays_rel_diff": rays_rel,
        "block_mean_abs": block_mean,
        "block_max_abs": block_max,
        "gates": {"mean": 0.02, "max": 0.20, "rays_rel": 5e-4},
        "pass": bool(block_mean < 0.02 and block_max < 0.20
                     and rays_rel < 5e-4),
    }

    # --- merged-vs-unmerged Pallas on chip (round 4: the merged
    # software-pipelined loop is the SHIPPING bench kernel).  Interpret
    # mode is bit-equal (tests/test_merged.py); on real hardware Mosaic
    # compiles two different programs, so expect the same chaos-level
    # per-pixel divergence as Pallas-vs-jnp and gate at the distribution
    # level with identical tolerances.  Single frame at the shipped
    # 720x128/K45 shape; distribution gate at the small parity config.
    mcfg = tpt.RenderConfig(width=1280, height=720, pix_per_lane=45,
                            tile_h=720, tile_w=128)
    mi, mr = jax.block_until_ready(render_frame_pallas(
        scene, mcfg.replace(merged_wavefront=True), jnp.int32(0)))
    ui, ur = jax.block_until_ready(render_frame_pallas(
        scene, mcfg, jnp.int32(0)))
    mi, ui = np.asarray(mi), np.asarray(ui)
    mdiff = np.abs(mi - ui)

    pm, rays_m = progressive(lambda s, c, i: render_frame_pallas(
        s, c.replace(merged_wavefront=True), i))
    tm = np.sqrt(np.clip(pm, 0, None))
    mb = tm.reshape(9, 4, 16, 4, 3).mean(axis=(1, 3))
    m_mean = float(np.abs(mb - ab).mean())
    m_max = float(np.abs(mb - ab).max())
    m_rel = abs(rays_m - rays_pp) / max(rays_pp, 1)
    out["merged_vs_unmerged"] = {
        "single_frame_config": {"width": mcfg.width, "height": mcfg.height,
                                "tile": [720, 128], "pix_per_lane": 45},
        "rays_merged": int(mr), "rays_unmerged": int(ur),
        "rays_rel_diff_single": abs(int(mr) - int(ur)) / max(int(ur), 1),
        "bit_equal": bool((mi == ui).all()),
        "max_abs_diff": float(mdiff.max()),
        "mean_abs_diff": float(mdiff.mean()),
        "progressive_16f": {"rays_rel_diff": m_rel,
                            "block_mean_abs": m_mean,
                            "block_max_abs": m_max},
        "gates": {"mean": 0.02, "max": 0.20, "rays_rel": 5e-4},
        "pass": bool(m_mean < 0.02 and m_max < 0.20 and m_rel < 5e-4),
    }

    os.makedirs(os.path.join(os.path.dirname(__file__), "..", "build"),
                exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "..", "build",
                        "tpu_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))
    # Contract: near-equal rays (chaotic Mosaic-vs-XLA divergence changes
    # path depths at the ~0.004% rate; exact equality holds only in
    # interpret mode) and a PASSING 16-frame distribution gate.  Round 2's
    # version asserted exact ray equality, which its own committed
    # artifact (rays_equal: false) contradicted -- the single-frame raw
    # stats stay in the artifact as data, the verdict is the gate.
    rel = abs(out["rays_pallas"] - out["rays_jnp"]) / out["rays_jnp"]
    assert rel < 5e-4, f"ray counts diverge beyond chaos rate: {rel}"
    assert out["progressive_mean"]["pass"], \
        "distribution gate failed: radiometric divergence beyond MC noise"
    print("tpu_parity: distribution gate PASS "
          f"(block mean {out['progressive_mean']['block_mean_abs']:.2e}, "
          f"max {out['progressive_mean']['block_max_abs']:.2e})")
    assert out["merged_vs_unmerged"]["pass"], \
        "merged-vs-unmerged distribution gate failed"
    print("tpu_parity: merged-vs-unmerged gate PASS "
          f"(block mean {out['merged_vs_unmerged']['progressive_16f']['block_mean_abs']:.2e})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
