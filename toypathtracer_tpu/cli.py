"""Headless CLI: render N frames, print the reference HUD, dump an image.

Modeled on the reference's C# command-line entry (reference:
Cs/Program.cs:7-59: 30 frames at 1280x720, per-frame Mray/s print, TGA
dump) with the exact cross-frontend HUD format
`"%.2fms (%.1f FPS) %.1fMrays/s %.2fMrays/frame frames %i"`
(reference: Cpp/Windows/TestWin.cpp:330, Cpp/Apple/Renderer.mm:251-253,
Cs/Program.cs:31).  Ray counting matches the reference: every primary,
bounce, and shadow ray increments the counter (Test.cpp:122, 199).

Usage:
    python -m toypathtracer_tpu [--frames 30] [--width 1280 --height 720]
        [--backend auto|pallas|jnp|parity|sharded] [--small] [--animate]
        [--no-progressive] [--output out.png|out.tga]
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import numpy as np

from . import io as image_io
from .config import FLAG_ANIMATE, FLAG_PROGRESSIVE, RenderConfig
from .render import frame as frame_mod
from .render.frame import RenderSession
from .scene import make_scene


def _enable_compile_cache():
    import os as _os
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.expanduser("~/.cache/jax_toypt"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # Honor a user's JAX_PLATFORMS env even where a site plugin pins the
    # platform list at registration time (the tunneled-TPU environment
    # does: env vars are read before the plugin overrides them, so only
    # a config update takes effect).  `JAX_PLATFORMS=cpu python -m
    # toypathtracer_tpu ...` must mean CPU -- otherwise a downed tunnel
    # turns the CLI into a silent hang.
    env_platforms = _os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        jax.config.update("jax_platforms", env_platforms)


def _pick_backend(name: str):
    """Resolve a backend name to a render_fn(scene, cfg, frame) or None
    (None = the default jnp wavefront renderer)."""
    import jax

    if name == "auto":
        name = "pallas" if jax.devices()[0].platform == "tpu" else "jnp"
    if name == "jnp":
        return None, "jnp"
    if name == "pallas":
        from .ops.pallas_render import render_frame_pallas
        return render_frame_pallas, "pallas"
    if name == "parity":
        from .render.parity import render_frame_parity
        return render_frame_parity, "parity"
    if name == "sharded":
        from .parallel.mesh import (make_mesh, render_frame_sharded_jit,
                                    render_frame_sharded_pallas)
        mesh = make_mesh()
        # On TPU each shard runs the fused Pallas kernel (the production
        # multi-chip configuration); elsewhere the jnp wavefront tiles.
        if jax.devices()[0].platform == "tpu":
            fn = partial(render_frame_sharded_pallas, mesh=mesh)
            tag = f"sharded-pallas x{len(mesh.devices.ravel())}"
        else:
            fn = partial(render_frame_sharded_jit, mesh=mesh)
            tag = f"sharded x{len(mesh.devices.ravel())}"
        return (lambda scene, cfg, frame: fn(scene, cfg, frame)), tag
    raise SystemExit(f"unknown backend {name!r}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="toypathtracer_tpu",
        description="TPU-native path tracer (ToyPathTracer capabilities)")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--max-depth", type=int, default=10)
    ap.add_argument("--frames", type=int, default=30,
                    help="frames to render (reference CLI renders 30)")
    ap.add_argument("--small", action="store_true",
                    help="9-sphere scene instead of the 46-sphere big scene")
    ap.add_argument("--scaled", type=int, default=0, metavar="N",
                    help="render the procedurally instanced N-sphere scene "
                         "(chunked AABB-culled traversal) instead of the "
                         "reference scene")
    ap.add_argument("--mitsuba-compare", action="store_true",
                    help="flat sky / zero aperture / mirror metal, for "
                         "comparison against Mitsuba/scene.xml")
    ap.add_argument("--no-light-sampling", action="store_true")
    ap.add_argument("--animate", action="store_true",
                    help="animate spheres 1 and 8 (kFlagAnimate)")
    ap.add_argument("--no-progressive", action="store_true",
                    help="disable progressive accumulation (kFlagProgressive)")
    ap.add_argument("--tile", default=None, metavar="H,W",
                    help="Pallas pixel-tile override (default 16,128)")
    ap.add_argument("--ppl", type=int, default=1, metavar="K",
                    help="pixels per lane in the Pallas wavefront "
                         "(occupancy tuning; image is bit-identical)")
    ap.add_argument("--batch", type=int, default=1, metavar="N",
                    help="frames fused per device dispatch "
                         "(render.frame.progressive_steps; each dispatch "
                         "pays a fixed ~0.3 s tunnel floor, so batched "
                         "headless renders finish several times faster; "
                         "HUD prints per-frame averages per batch; "
                         "ignored when --animate)")
    ap.add_argument("--merged", action="store_true",
                    help="software-pipelined merged-traversal wavefront "
                         "(one sphere loop per bounce for argmin + NEE "
                         "occlusion; same images/counts, see "
                         "docs/PERFORMANCE.md)")
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "pallas", "jnp", "parity", "sharded"])
    ap.add_argument("--output", default="output.png",
                    help=".png or .tga (reference dumps output.tga)")
    ap.add_argument("--resume", metavar="STATE.npz",
                    help="resume progressive accumulation from a state saved "
                         "with --save-state (the (accum, frame) tuple -- "
                         "SURVEY.md section 5's checkpointable step state)")
    ap.add_argument("--save-state", metavar="STATE.npz",
                    help="write the final accumulation state for --resume")
    args = ap.parse_args(argv)

    _enable_compile_cache()
    cfg = RenderConfig(
        width=args.width, height=args.height,
        samples_per_pixel=args.spp, max_depth=args.max_depth,
        do_light_sampling=not args.no_light_sampling,
        do_mitsuba_compare=args.mitsuba_compare,
        pix_per_lane=args.ppl,
        merged_wavefront=args.merged,
    )
    if args.tile:
        th, tw = (int(x) for x in args.tile.split(","))
        cfg = cfg.replace(tile_h=th, tile_w=tw)
    if args.scaled:
        from .scaled import make_scaled_scene
        # --animate works: ScaledScene.animate orbits the emissive
        # beacons and refreshes chunk AABBs (scaled.py)
        if args.backend not in ("auto", "jnp"):
            raise SystemExit("--scaled uses its own chunked renderer")
        scene = make_scaled_scene(n=args.scaled)
        args.backend = "__scaled__"
    else:
        scene = make_scene(big=not args.small,
                           mitsuba_compare=args.mitsuba_compare)
        # (interval-overlap shadow hazards are checked by RenderSession's
        # validate_scene call -- the seam every scene passes through)
    flags = 0
    if not args.no_progressive:
        flags |= FLAG_PROGRESSIVE
    if args.animate:
        flags |= FLAG_ANIMATE

    # First device-backend touch (either branch below probes
    # jax.devices()): on a tunneled-TPU host with the tunnel down this
    # BLOCKS (it does not raise), so say what we're doing and how to
    # escape before going quiet.
    import sys as _sys
    print("probing device backend (JAX_PLATFORMS=cpu forces local CPU)...",
          file=_sys.stderr, flush=True)
    if args.backend == "__scaled__":
        from .scaled import render_frame_scaled, uses_pallas
        # the label queries the same predicate render_frame_scaled's
        # pallas=None auto-select uses, so it cannot drift from what runs
        render_fn = render_frame_scaled
        backend_name = (f"scaled {'pallas' if uses_pallas() else 'jnp'} "
                        f"({args.scaled} spheres)")
    else:
        render_fn, backend_name = _pick_backend(args.backend)
    sess = RenderSession(scene, cfg, flags=flags, render_fn=render_fn)
    frame0 = 0
    if args.resume:
        from .checkpoint import load_frame_state
        sess.state = load_frame_state(args.resume)
        frame0 = int(np.asarray(sess.state.frame))
        if sess.state.accum.shape != (cfg.height, cfg.width, 3):
            raise SystemExit(f"--resume state is {sess.state.accum.shape}, "
                             f"render is {(cfg.height, cfg.width, 3)}")

    import jax
    print(f"backend={backend_name} device={jax.devices()[0].device_kind} "
          f"scene={args.scaled if args.scaled else (9 if args.small else 46)}-sphere "
          f"{cfg.width}x{cfg.height} spp={cfg.samples_per_pixel}")

    from .profiling import hud_string

    # Frames fused per device dispatch (render.frame.progressive_steps):
    # each dispatch pays a fixed ~0.3 s tunnel floor
    # (docs/measured/bench_frames_r4.json), so batched headless renders
    # finish several times faster.  Only while PROGRESSIVE accumulation
    # is on (otherwise each fused frame overwrites the last -- n-1 of n
    # wasted) and animation is off (frames need distinct wall-clock
    # times).
    batch = max(1, args.batch) if (flags & FLAG_PROGRESSIVE
                                   and not flags & FLAG_ANIMATE) else 1
    img = None
    f = frame0
    while f < frame0 + args.frames:
        n = min(batch, frame0 + args.frames - f)
        t0 = time.perf_counter()
        img, raycount = sess.steps(time=f / 60.0, n=n)
        # force completion via a host transfer (device sync); raycount is
        # per-frame for n > 1 -- exact int64 host sum (no int32 wrap)
        rays = frame_mod.sum_rays(raycount)
        dt = time.perf_counter() - t0
        # the reference HUD string (TestWin.cpp:330), per-frame units
        print(hud_string("TPU path tracer", dt / n, rays // n, f + n))
        f += n

    if args.save_state:
        from .checkpoint import save_frame_state
        save_frame_state(args.save_state, sess.state)
        print(f"saved state {args.save_state} "
              f"(frame {int(np.asarray(sess.state.frame))})")
    if args.output and img is not None:
        image_io.write_image(args.output, np.asarray(img))
        print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
