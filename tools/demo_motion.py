#!/usr/bin/env python3
"""Motion-parameter recovery demo (BASELINE.json config 4).

The reference's animation moves sphere 1 (y = cos t + 1) and sphere 8
(z = 0.3 sin t) (reference: Cpp/Source/Test.cpp:304-308).  Here the
animation TIME is recovered by gradient descent from a single rendered
frame: render a target at t_true, start from t_guess, and minimize pixel
L2 through Scene.animate + the differentiable renderer.  d(image)/d(t)
flows through the animated sphere centers (tests/test_motion.py proves
the gradient path; this tool closes the loop on real hardware).

Usage: python tools/demo_motion.py [--t-true 0.8] [--t-guess 0.3]
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
    ap.add_argument("--t-true", type=float, default=0.8)
    ap.add_argument("--t-guess", type=float, default=0.3)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--height", type=int, default=108)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    import toypathtracer_tpu as tpt
    from toypathtracer_tpu.inverse import image_l2_tonemapped
    from toypathtracer_tpu.render.frame import scene_for_frame
    from toypathtracer_tpu.config import FLAG_ANIMATE
    from toypathtracer_tpu.render.wavefront import render_frame

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_toypt"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    # geometry-recovery recipe (inverse.py docstring): soft-silhouette
    # estimator + tonemapped loss -- sphere 8 is an emissive whose moving
    # silhouette otherwise dominates with unusable hard-select gradients
    cfg = tpt.RenderConfig(width=args.width, height=args.height,
                           samples_per_pixel=2, max_depth=4,
                           soft_silhouette_eps=0.05)
    scene = tpt.make_scene(big=True)

    def render_at(t):
        s = scene_for_frame(scene, t, FLAG_ANIMATE)
        img, _ = render_frame(s, cfg, jnp.int32(0), differentiable=True)
        return img

    target = jax.lax.stop_gradient(render_at(jnp.float32(args.t_true)))
    loss_of_t = jax.jit(jax.value_and_grad(
        lambda t: image_l2_tonemapped(render_at(t), target)))

    opt = optax.adam(args.lr)
    t = jnp.float32(args.t_guess)
    state = opt.init(t)
    loss0 = None
    t0 = time.perf_counter()
    for i in range(args.steps):
        loss, g = loss_of_t(t)
        if loss0 is None:
            loss0 = float(loss)
        upd, state = opt.update(g, state)
        t = optax.apply_updates(t, upd)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "t_true": args.t_true,
        "t_guess": args.t_guess,
        "t_recovered": float(t),
        "t_abs_err": abs(float(t) - args.t_true),
        "loss_initial": loss0,
        "loss_final": float(loss),
        "steps": args.steps,
        "seconds": round(dt, 1),
    }))


if __name__ == "__main__":
    main()
