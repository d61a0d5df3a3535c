#!/usr/bin/env python3
"""End-to-end inverse-rendering demo (BASELINE.json config 3).

Perturbs the 46-sphere scene (sphere centers + albedo), renders a target
with the TRUE scene, then recovers the perturbed parameters by Adam on
pixel L2 through the differentiable wavefront renderer.  Writes
target/initial/recovered PNGs and prints a JSON result line.

Default mode recovers perturbed albedo (converges to ~machine-precision
loss).  Geometry mode:

    python tools/demo_inverse.py --trainable center,albedo \
        --center-jitter 0.02 --lr 2e-3

needs the soft-silhouette estimator (--soft-eps, on by default; recipe in
inverse.py docstring) -- with hard selects d(loss)/d(center) lacks the
silhouette term and optimization diverges (measured).  Single-view
identifiability bounds what geometry mode can do on occluded spheres.

Usage: python tools/demo_inverse.py [--steps 200] [--width 192 --height 108]
                                    [--outdir build/inverse_demo]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--height", type=int, default=108)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument("--outdir", default="build/inverse_demo")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--trainable", default="albedo",
                    help="comma list of scene fields to optimize")
    ap.add_argument("--center-jitter", type=float, default=0.0)
    ap.add_argument("--albedo-jitter", type=float, default=0.15)
    ap.add_argument("--soft-eps", type=float, default=0.05,
                    help="soft-silhouette eps (0 disables; see RenderConfig)")
    ap.add_argument("--tonemap-loss", action="store_true",
                    help="L2 on Reinhard-compressed radiance; use in geometry "
                         "mode so the ~25x-brighter emissive pixels (whose "
                         "silhouettes are unmodeled) do not dominate")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import toypathtracer_tpu as tpt
    from toypathtracer_tpu import io as image_io
    from toypathtracer_tpu.inverse import (InverseRenderer, image_l2,
                                           image_l2_tonemapped)
    from toypathtracer_tpu.render.wavefront import render_frame

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_toypt"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    os.makedirs(args.outdir, exist_ok=True)
    cfg = tpt.RenderConfig(width=args.width, height=args.height,
                           samples_per_pixel=args.spp, max_depth=args.depth,
                           soft_silhouette_eps=args.soft_eps)
    true_scene = tpt.make_scene(big=True)

    # Perturb: jitter every non-emissive sphere's center and albedo.
    rng = np.random.default_rng(args.seed)
    emissive = np.zeros(true_scene.center.shape[0], bool)
    emissive[list(true_scene.emissive_ids)] = True
    c_jit = rng.normal(0, args.center_jitter, true_scene.center.shape).astype(np.float32)
    a_jit = rng.normal(0, args.albedo_jitter, true_scene.albedo.shape).astype(np.float32)
    c_jit[emissive] = 0.0
    a_jit[emissive] = 0.0
    start = true_scene.replace(
        center=true_scene.center + c_jit,
        albedo=jnp.clip(true_scene.albedo + a_jit, 0.02, 0.98),
    )

    # Target from the TRUE scene with the same sample set the optimizer
    # uses (resample=False -> deterministic objective, loss -> ~0).
    frame0 = jnp.int32(0)
    target, _ = render_frame(true_scene, cfg, frame0, differentiable=True)
    target = jax.lax.stop_gradient(target)
    loss_fn = image_l2_tonemapped if args.tonemap_loss else image_l2
    img0, _ = render_frame(start, cfg, frame0, differentiable=True)
    loss0 = float(loss_fn(img0, target))

    inv = InverseRenderer(cfg, target,
                          trainable=tuple(args.trainable.split(",")),
                          learning_rate=args.lr, loss_fn=loss_fn,
                          adam_eps=1e-3)
    t0 = time.perf_counter()
    fitted, losses = inv.fit(start, steps=args.steps, frame0=0,
                             resample=False)
    fit_s = time.perf_counter() - t0

    imgN, _ = render_frame(fitted, cfg, frame0, differentiable=True)
    image_io.write_png(os.path.join(args.outdir, "target.png"),
                       np.asarray(target))
    image_io.write_png(os.path.join(args.outdir, "initial.png"),
                       np.asarray(img0))
    image_io.write_png(os.path.join(args.outdir, "recovered.png"),
                       np.asarray(imgN))

    ce0 = np.abs(np.asarray(start.center - true_scene.center))
    ceN = np.abs(np.asarray(fitted.center - true_scene.center))
    center_err0, center_errN = float(ce0.max()), float(ceN.max())
    center_mean0, center_meanN = float(ce0.mean()), float(ceN.mean())
    albedo_err0 = float(np.abs(np.asarray(start.albedo
                                          - true_scene.albedo)).max())
    albedo_errN = float(np.abs(np.asarray(fitted.albedo
                                          - true_scene.albedo)).max())
    print(json.dumps({
        "steps": args.steps,
        "seconds": round(fit_s, 1),
        "loss_initial": loss0,
        "loss_final": losses[-1],
        "loss_drop_x": round(loss0 / max(losses[-1], 1e-12), 1),
        "center_maxerr_initial": center_err0,
        "center_maxerr_final": center_errN,
        "center_meanerr_initial": center_mean0,
        "center_meanerr_final": center_meanN,
        "albedo_maxerr_initial": albedo_err0,
        "albedo_maxerr_final": albedo_errN,
        "outdir": args.outdir,
    }))


if __name__ == "__main__":
    main()
