#!/usr/bin/env python3
"""Measure motion-parameter AD vs FD with the soft-visibility estimators.

BASELINE config 4 needs d(image)/d(t) where t moves spheres 1 and 8
(reference: Test.cpp:304-308).  Round 1's one-sided estimator missed the
miss-side silhouette and all NEE shadow boundaries, leaving AD orders of
magnitude below FD; round 2 adds the two-sided silhouette term
(tracecore.silhouette_query + _tangent_radiance) and the NEE
shadow-boundary sigmoid (_lights_occlusion_proximity).  This tool
quantifies the fix.

FD of a *fixed-seed* stochastic render is dominated by discrete per-pixel
branch flips at small step sizes, so both sides are computed on the
EXPECTED image: mean over F independent sample sets (frame indices seed
independent RNG streams).  AD of the mean is the mean of per-frame ADs.

Usage: python tools/measure_motion_grad.py [--frames 64] [--eps-t 0.02]
                                           [--soft-eps 0.02] [--t 0.7]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--eps-t", type=float, default=0.02)
    ap.add_argument("--soft-eps", type=float, default=0.02)
    ap.add_argument("--t", type=float, default=0.7)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=32)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu); the axon "
                         "sitecustomize ignores the env var")
    ap.add_argument("--json", default=None,
                    help="also write the results to this path")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_toypt"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from toypathtracer_tpu import FLAG_ANIMATE, RenderConfig, make_scene
    from toypathtracer_tpu.render.frame import scene_for_frame
    from toypathtracer_tpu.render.wavefront import render_frame

    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=args.spp, max_depth=args.depth,
                       soft_silhouette_eps=args.soft_eps)
    cfg_hard = cfg.replace(soft_silhouette_eps=0.0)
    scene = make_scene(big=True)
    frames = jnp.arange(args.frames, dtype=jnp.int32)

    def mean_img(t, c):
        def one(f):
            s = scene_for_frame(scene, t, FLAG_ANIMATE)
            img, _ = render_frame(s, c, f, differentiable=True)
            return jnp.mean(img)
        return jnp.mean(jax.vmap(one)(frames))

    t0 = time.perf_counter()
    g_ad = float(jax.jit(jax.grad(lambda t: mean_img(t, cfg)))(
        jnp.float32(args.t)))
    g_ad_hard = float(jax.jit(jax.grad(lambda t: mean_img(t, cfg_hard)))(
        jnp.float32(args.t)))
    f = jax.jit(lambda t: mean_img(t, cfg_hard))
    e = args.eps_t
    g_fd = (float(f(jnp.float32(args.t + e)))
            - float(f(jnp.float32(args.t - e)))) / (2 * e)
    dt = time.perf_counter() - t0
    rel = abs(g_ad - g_fd) / (abs(g_fd) + 1e-12)
    rel_hard = abs(g_ad_hard - g_fd) / (abs(g_fd) + 1e-12)
    print(f"t={args.t} frames={args.frames} eps_t={e} "
          f"soft_eps={args.soft_eps} ({dt:.0f}s)")
    print(f"  FD (expected image): {g_fd:+.6e}")
    print(f"  AD soft (two-sided): {g_ad:+.6e}  rel-err {rel:.3f}")
    print(f"  AD hard (shading)  : {g_ad_hard:+.6e}  rel-err {rel_hard:.3f}")
    if args.json:
        import json
        os.makedirs("build", exist_ok=True)
        with open(args.json, "w") as fh:
            json.dump({
                "config": {"width": args.width, "height": args.height,
                           "spp": args.spp, "depth": args.depth,
                           "frames": args.frames, "t": args.t,
                           "eps_t": e, "soft_eps": args.soft_eps},
                "fd_expected_image": g_fd,
                "ad_soft_two_sided": g_ad,
                "ad_hard_shading_only": g_ad_hard,
                "rel_err_soft": rel,
                "rel_err_hard": rel_hard,
                "seconds": round(dt, 1),
            }, fh, indent=1)
            fh.write("\n")
        print("wrote", args.json)


if __name__ == "__main__":
    main()
