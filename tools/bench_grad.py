#!/usr/bin/env python3
"""Forward+backward benchmark: Mray/s of a full differentiable render step.

BASELINE.json's metric names "Mray/s/chip fwd and fwd+bwd at 720p 4spp";
bench.py reports the forward number, this tool reports the training-step
number: value_and_grad of the pixel-L2 loss w.r.t. every scene parameter
(the inverse-rendering step of toypathtracer_tpu/inverse.py), rays counted
as in the forward pass (the backward replays the same ray tree).

Usage: python tools/bench_grad.py [--width 1280 --height 720 --spp 4
                                   --depth 10 --frames 4]
                                  [--backend jnp|pallas]

--backend pallas routes through ops/pallas_grad.render_frame_pallas_diff:
fused Pallas forward + in-kernel-vjp backward (per-bounce carries stay in
VMEM instead of round-tripping HBM).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--frames", type=int, default=48,
                    help="steps per timed call; the timed call carries a "
                         "~250-390 ms fixed dispatch+transfer floor "
                         "(docs/measured/bench_frames_r4.json), so short "
                         "runs understate throughput -- the old default "
                         "of 4 hid ~30%% of the kernel's rate")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--backend", choices=("jnp", "pallas"), default="jnp")
    ap.add_argument("--wavefront", type=int, default=0, metavar="0|1",
                    help="cfg.diff_wavefront: differentiate the merged "
                         "persistent-wavefront loop itself (fixed-bound "
                         "fori + cond early-out; round 5) instead of the "
                         "lockstep spp loop -- cuts the dead-lane depth "
                         "tail from the backward sweep")
    ap.add_argument("--merged", type=int, default=1, metavar="0|1",
                    help="cfg.merged_wavefront: route the differentiable "
                         "lockstep trace through the merged traversal "
                         "(round 5: one sphere loop answers NEE occlusion "
                         "+ next argmin, tracecore.bounce_parts_merged); "
                         "0 = the unmerged round-4 formulation")
    ap.add_argument("--grad-tile", default=None, metavar="H,W",
                    help="grad_tile_h,grad_tile_w override (pallas backend; "
                         "default 8,128 -- the backward kernel's VMEM "
                         "working set per tile is ~depth x the forward's, "
                         "so its tile ceiling is lower)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import toypathtracer_tpu as tpt
    from toypathtracer_tpu.inverse import render_loss
    from toypathtracer_tpu.render.wavefront import render_frame

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_toypt"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    cfg = tpt.RenderConfig(width=args.width, height=args.height,
                           samples_per_pixel=args.spp,
                           max_depth=args.depth,
                           merged_wavefront=bool(args.merged),
                           diff_wavefront=bool(args.wavefront))
    if args.grad_tile:
        gh, gw = (int(x) for x in args.grad_tile.split(","))
        cfg = cfg.replace(grad_tile_h=gh, grad_tile_w=gw)
    scene = tpt.make_scene(big=True)
    print(f"bench_grad: {cfg.width}x{cfg.height} spp={args.spp} "
          f"depth={args.depth} device={jax.devices()[0].device_kind}",
          file=sys.stderr)

    # target + per-frame ray count from the forward renderer
    target, rays_per_frame = render_frame(scene, cfg, jnp.int32(0))
    target = jax.lax.stop_gradient(target)
    rays_per_frame = int(rays_per_frame)

    vg = jax.value_and_grad(
        lambda s, f: render_loss(s, target, cfg, f, backend=args.backend))

    # The gradient work must stay LIVE through the scan: every grad leaf
    # is summed into the returned accumulator.  (Through round 4 the body
    # emitted grads only as the scan's discarded ys, and XLA's
    # while-loop simplifier dead-code-eliminated the entire backward --
    # the "fwd+bwd" numbers it printed were the forward primal alone;
    # see docs/measured/bench_grad_r5_dce.json.)
    @jax.jit
    def steps(scene):
        def body(acc, f):
            loss, grads = vg(scene, f)
            gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads)
                       if jnp.issubdtype(jnp.asarray(g).dtype, jnp.floating))
            return acc + loss + gsum, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(args.frames, dtype=jnp.int32))
        return acc

    t0 = time.perf_counter()
    np.asarray(steps(scene))
    print(f"bench_grad: warmup {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    best = 0.0
    for _ in range(args.reps):
        t0 = time.perf_counter()
        np.asarray(steps(scene))
        dt = time.perf_counter() - t0
        mrays = rays_per_frame * args.frames / dt * 1e-6
        best = max(best, mrays)
        print(f"bench_grad: {dt / args.frames * 1000:.1f}ms/step "
              f"{mrays:.1f} Mray/s (fwd+bwd)", file=sys.stderr)
    import json
    print(json.dumps({"metric": "Mray/s fwd+bwd", "value": round(best, 1),
                      "unit": "Mray/s", "backend": args.backend}))


if __name__ == "__main__":
    main()
