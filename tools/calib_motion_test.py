#!/usr/bin/env python3
"""Calibrate an affordable config for the motion AD-vs-FD test.

Sweeps candidate (W, H, spp, depth, frames, eps_t) configs and prints the
soft-AD vs FD relative error for each, reusing ONE compiled render/grad
pair per config (Python loop over frame indices instead of vmap, so
compile cost is a single render + a single grad regardless of frames).

CPU-only calibration: run with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


CANDIDATES = [
    # (width, height, spp, depth, frames, eps_t, soft_eps)
    (96, 32, 2, 2, 32, 0.05, 0.02),
    (96, 32, 2, 2, 48, 0.02, 0.02),
    (64, 24, 2, 3, 32, 0.05, 0.02),
    (96, 32, 2, 3, 48, 0.02, 0.02),
]


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_toypt"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from toypathtracer_tpu import FLAG_ANIMATE, RenderConfig, make_scene
    from toypathtracer_tpu.render.frame import scene_for_frame
    from toypathtracer_tpu.render.wavefront import render_frame

    scene = make_scene(big=True)
    t_at = 0.7

    for (w, h, spp, depth, frames, eps_t, soft_eps) in CANDIDATES:
        cfg = RenderConfig(width=w, height=h, samples_per_pixel=spp,
                           max_depth=depth, soft_silhouette_eps=soft_eps)

        def mean_img(t, f, c=cfg):
            s = scene_for_frame(scene, t, FLAG_ANIMATE)
            img, _ = render_frame(s, c, f, differentiable=True)
            return jnp.mean(img)

        f_jit = jax.jit(mean_img)
        g_jit = jax.jit(jax.grad(mean_img))

        t0 = time.perf_counter()
        # warm both compiles
        f_jit(jnp.float32(t_at), jnp.int32(0)).block_until_ready()
        g_jit(jnp.float32(t_at), jnp.int32(0)).block_until_ready()
        t_compile = time.perf_counter() - t0

        t0 = time.perf_counter()
        ad, fp, fm = 0.0, 0.0, 0.0
        for fr in range(frames):
            fi = jnp.int32(fr)
            ad += float(g_jit(jnp.float32(t_at), fi))
            fp += float(f_jit(jnp.float32(t_at + eps_t), fi))
            fm += float(f_jit(jnp.float32(t_at - eps_t), fi))
        t_run = time.perf_counter() - t0
        ad /= frames
        fd = (fp - fm) / (2 * eps_t * frames)
        rel = abs(ad - fd) / (abs(fd) + 1e-12)
        print(f"{w}x{h} spp{spp} d{depth} F{frames} eps{eps_t} "
              f"soft{soft_eps}: AD {ad:+.6e} FD {fd:+.6e} rel {rel:.3f} "
              f"(compile {t_compile:.0f}s run {t_run:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
