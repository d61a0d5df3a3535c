#!/usr/bin/env python3
"""Decompose the fwd+bwd step time: primal forward vs gradient kernel.

Times, at the SAME cfg bench_grad.py uses (default tiles unless
overridden), over a steady-state N-frame scan each:
  1. render_frame_pallas          -- the custom_vjp primal (fast fused)
  2. render_tile_lockstep_pallas  -- the lockstep forward the backward
                                     kernel differentiates (full frame)
  3. value_and_grad step          -- the full fwd+bwd (as bench_grad)
so (3) - (1) isolates the gradient kernel's cost, and (2) bounds the
forward sweep share inside it.  Prints one JSON line.
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
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--wavefront", type=int, default=0)
    ap.add_argument("--merged", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import toypathtracer_tpu as tpt
    from toypathtracer_tpu.inverse import render_loss
    from toypathtracer_tpu.render.wavefront import render_frame
    from toypathtracer_tpu.ops.pallas_render import render_frame_pallas
    from toypathtracer_tpu.ops.pallas_grad import render_tile_lockstep_pallas

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_toypt"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    cfg = tpt.RenderConfig(merged_wavefront=bool(args.merged),
                           diff_wavefront=bool(args.wavefront))
    scene = tpt.make_scene(big=True)
    target, rays_per_frame = render_frame(scene, cfg, jnp.int32(0))
    target = jax.lax.stop_gradient(target)
    rays_per_frame = int(rays_per_frame)

    frames, reps = args.frames, args.reps
    fidx = jnp.arange(frames, dtype=jnp.int32)

    def steady(label, step_fn):
        @jax.jit
        def scan(s):
            def body(acc, f):
                return acc + step_fn(s, f), 0
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), fidx)
            return acc
        t0 = time.perf_counter()
        np.asarray(scan(scene))
        warm = time.perf_counter() - t0
        best = 1e30
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(scan(scene))
            best = min(best, time.perf_counter() - t0)
        ms = best / frames * 1000
        print(f"decompose: {label}: {ms:.2f}ms/frame "
              f"({rays_per_frame / best * frames * 1e-6:.1f} Mray/s), "
              f"warmup {warm:.1f}s", file=sys.stderr)
        return ms

    ms_fwd = steady("primal fused forward (default tiles)",
                    lambda s, f: render_frame_pallas(s, cfg, f)[0][0].sum())
    ms_lock = steady("lockstep fwd (grad-kernel formulation, fwd only)",
                     lambda s, f: render_tile_lockstep_pallas(
                         s, cfg, f, 0, 0, cfg.height, cfg.width)[0][0].sum())
    vg = jax.value_and_grad(
        lambda s, f: render_loss(s, target, cfg, f, backend="pallas"))
    ms_step = steady("full fwd+bwd step",
                     lambda s, f: vg(s, f)[0])

    print(json.dumps({
        "what": "fwd+bwd decomposition (720p/4spp/d10, default tiles)",
        "cfg": {"merged": bool(args.merged),
                "wavefront": bool(args.wavefront)},
        "ms_primal_forward": round(ms_fwd, 2),
        "ms_lockstep_forward": round(ms_lock, 2),
        "ms_full_step": round(ms_step, 2),
        "ms_grad_kernel_est": round(ms_step - ms_fwd, 2),
    }))


if __name__ == "__main__":
    main()
