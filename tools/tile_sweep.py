"""Tile-size sweep for the Pallas render kernel on real TPU.

Times a short progressive scan at the benchmark workload (720p, 4spp,
big scene) for several (tile_h, tile_w[, pix_per_lane]) shapes and prints
Mray/s each.
Usage: python tools/tile_sweep.py [tile_h,tile_w[,K] ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import toypathtracer_tpu as tpt
    from toypathtracer_tpu.ops.pallas_render import render_frame_pallas

    shapes = [(16, 128, 1), (16, 128, 2), (24, 128, 3), (40, 128, 5),
              (72, 128, 9), (120, 128, 15)]
    if len(sys.argv) > 1:
        shapes = [tuple(int(x) for x in (a + ",1").split(",")[:3])
                  for a in sys.argv[1:]]

    scene = tpt.make_scene(big=True)
    frames = 6
    for th, tw, ppl in shapes:
        cfg = tpt.RenderConfig(width=1280, height=720, samples_per_pixel=4,
                               max_depth=10, tile_h=th, tile_w=tw,
                               pix_per_lane=ppl)

        @jax.jit
        def run(scene, cfg=cfg):
            def step(acc, i):
                img, rays = render_frame_pallas(scene, cfg, i)
                return acc + img, rays
            acc, rays = jax.lax.scan(
                step, jnp.zeros((cfg.height, cfg.width, 3), jnp.float32),
                jnp.arange(frames, dtype=jnp.int32))
            return acc, rays

        try:
            t0 = time.perf_counter()
            acc, rays = run(scene)
            np.asarray(acc)
            compile_s = time.perf_counter() - t0
            # repeat: device throughput varies run to run (shared tunnel);
            # report every rep and the best
            mrays = []
            for _ in range(3):
                t0 = time.perf_counter()
                acc, rays = run(scene)
                np.asarray(acc)
                dt = time.perf_counter() - t0
                total = int(np.asarray(rays).astype(np.int64).sum())
                mrays.append(total / dt * 1e-6)
            print(f"tile {th}x{tw} K{ppl}: best {max(mrays):8.1f} Mray/s  "
                  f"reps {['%.0f' % m for m in mrays]} "
                  f"(compile {compile_s:.0f}s)", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"tile {th}x{tw} K{ppl}: FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
