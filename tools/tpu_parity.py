#!/usr/bin/env python3
"""Real-TPU Pallas-vs-jnp parity artifact (VERDICT round 1, item 6).

Renders one frame with the Mosaic-COMPILED Pallas kernel and with the
XLA-compiled jnp wavefront on the same device, and writes bit-equality /
max-abs stats to build/tpu_parity.json.  The interpret-mode bit-identity
test (tests/test_pallas.py) proves the two share one formulation; this
artifact proves the compiled kernel agrees on real hardware -- the
framework analog of the reference's cross-implementation checklist
(reference: readme.md:34-47).

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
    os.makedirs(os.path.join(os.path.dirname(__file__), "..", "build"),
                exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "..", "build",
                        "tpu_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))
    # Contract: same formulation => same rays always; pixel bits may
    # differ only if Mosaic and XLA schedule FMAs differently (none
    # observed on v5e -- see the committed artifact).
    assert out["rays_equal"], "ray counts diverge: formulation bug"
    return 0


if __name__ == "__main__":
    sys.exit(main())
