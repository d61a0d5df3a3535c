#!/usr/bin/env python3
"""Measured wavefront occupancy of the fused Pallas kernel (VERDICT round
1 item 3b): per-tile loop-trip and live-lane-work counters, DETERMINISTIC
(same seeds -> same counts), so the numbers are immune to the shared
tunnel's +/-40% timing noise.

occupancy(tile) = work / (iters * lanes): the fraction of VPU lane-slots
in the persistent-wavefront while loop doing real bounce work.  The
ideal-iteration bound iters_min = ceil(per-lane sample-bounge demand /
refill granularity) is also reported per tile as work / lanes (a lane
doing w bounces needs >= w trips).

Run inside the TPU bench window: python tools/occupancy.py [--width ...]
Writes build/occupancy.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--frame", type=int, default=0)
    ap.add_argument("--ppl", type=int, default=1,
                    help="pixels per lane (RenderConfig.pix_per_lane)")
    ap.add_argument("--tile", default=None,
                    help="tile_h,tile_w override, e.g. 16,128")
    ap.add_argument("--out", default=None,
                    help="output path (default build/occupancy.json)")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_toypt"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import toypathtracer_tpu as tpt
    from toypathtracer_tpu.ops.pallas_render import render_frame_pallas_stats

    cfg = tpt.RenderConfig(width=args.width, height=args.height,
                           samples_per_pixel=args.spp, max_depth=args.depth,
                           pix_per_lane=args.ppl)
    if args.tile:
        th, tw = (int(x) for x in args.tile.split(","))
        cfg = cfg.replace(tile_h=th, tile_w=tw)
    scene = tpt.make_scene(big=True)
    img, rays, it, wk = render_frame_pallas_stats(
        scene, cfg, jnp.int32(args.frame), interpret=args.interpret)
    it = np.asarray(it).astype(np.int64)
    wk = np.asarray(wk).astype(np.int64)
    from toypathtracer_tpu.ops.pallas_render import _resolve_pix_per_lane
    ppl = _resolve_pix_per_lane(cfg, -cfg.height % cfg.tile_h,
                                -cfg.width % cfg.tile_w)
    lanes = (cfg.tile_h // ppl) * cfg.tile_w
    occ = wk / np.maximum(it * lanes, 1)
    ideal_iters = np.ceil(wk / lanes)
    out = {
        "device": str(jax.devices()[0]),
        "config": {"width": cfg.width, "height": cfg.height,
                   "spp": cfg.samples_per_pixel, "depth": cfg.max_depth,
                   "tile": [cfg.tile_h, cfg.tile_w],
                   "pix_per_lane": ppl},
        "rays": int(rays),
        "tiles": int(it.size),
        "iters": {"sum": int(it.sum()), "mean": float(it.mean()),
                  "min": int(it.min()), "max": int(it.max())},
        "work_lane_bounces": int(wk.sum()),
        "occupancy": {"mean": float(occ.mean()), "min": float(occ.min()),
                      "max": float(occ.max()),
                      "weighted": float(wk.sum() / (it.sum() * lanes))},
        "iters_vs_ideal": float(it.sum() / max(ideal_iters.sum(), 1)),
        "img_mean": float(np.asarray(img).mean()),
    }
    path = args.out or os.path.join("build", "occupancy.json")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
