#!/usr/bin/env python3
"""Empirical issue-rate / speed-of-light measurement (round 5).

The round-4 census speed-of-light model broke: 1103 Mray/s measured >
980 "ceiling", i.e. Mosaic+XLA fusion eliminates an unknown fraction of
the counted ops and no post-fusion op count is obtainable client-side
(the Mosaic compiler runs behind the tunnel; no assembly dump).  This
tool measures the thing the model actually needs -- the IN-CONTEXT cost
of one extra VPU op per wavefront iteration -- directly:

  TPT_DUMMY_OPS=N injects a chain of N dependent dummy FMAs into the
  merged wavefront loop body (ops/tracecore.py, consumed via an
  impossible compare so counts stay exact while the ops stay live).
  Wall time per frame is linear in N:

      t(N) = t0 + N * iters_per_frame * tau_op

  The fitted tau_op converts any census op-delta directly into wall
  time, and the residual model

      headroom ~= (cuttable_ops * iters_per_frame * tau_op) / t0

  replaces the broken pre-fusion census roofline.  A sublinear fit at
  small N (slope much below the large-N slope) means the loop still has
  un-used issue slots -- i.e. it is NOT pure-issue-bound and latency or
  memory stalls dominate.

Writes build/issue_slope.json and prints a summary.  Run on the real
chip: the per-frame times use bench.py's steady-state protocol
(BENCH_FRAMES=384 scan), one subprocess per N so the env knob re-traces.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# iters/frame at the shipped 720x128/K=45 merged config (sequential over
# the 10-tile grid), measured by tools/occupancy.py:
# docs/measured/occupancy_720x128_k45.json
DEFAULT_ITERS_PER_FRAME = 5551


def run_bench(n_dummy: int, frames: int, reps: int):
    """One bench subprocess; returns Mray/s or None on failure (the sweep
    keeps its completed points either way -- losing tens of minutes of
    chip measurements to one flaky point is the failure mode here)."""
    env = dict(os.environ)
    env["TPT_DUMMY_OPS"] = str(n_dummy)
    env["BENCH_FRAMES"] = str(frames)
    env["BENCH_REPS"] = str(reps)
    # per-point budget below the outer script timeouts: in-process
    # watchdog first, then the subprocess kill
    env.setdefault("BENCH_DEADLINE_S", "900")
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env, timeout=1200)
        line = out.stdout.strip().splitlines()[-1]
        d = json.loads(line)
    except Exception as e:
        sys.stderr.write(f"issue_slope: N={n_dummy} FAILED ({e})\n")
        return None
    if d.get("value") is None:
        sys.stderr.write(f"issue_slope: N={n_dummy} FAILED "
                         f"({d.get('error')})\n")
        return None
    sys.stderr.write(f"issue_slope: N={n_dummy} -> {d['value']} Mray/s\n")
    return d["value"]


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="0,64,128,256,512",
                    help="comma-separated TPT_DUMMY_OPS values")
    ap.add_argument("--frames", type=int, default=384)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--iters-per-frame", type=int,
                    default=DEFAULT_ITERS_PER_FRAME)
    ap.add_argument("--out", default=os.path.join(REPO, "build",
                                                  "issue_slope.json"))
    args = ap.parse_args()

    ns = [int(x) for x in args.points.split(",")]
    results = []
    rays_per_frame = 16_772_198  # 720p/4spp big scene (occupancy artifact)
    for n in ns:
        mrays = run_bench(n, args.frames, args.reps)
        if mrays is None:
            continue  # keep the sweep's completed points
        # bench counts the same rays at any N (the probe can't change
        # counts).  t_per_frame = rays / (Mray/s)
        t_ms = rays_per_frame / (mrays * 1e6) * 1e3
        results.append({"dummy_ops": n, "mrays": mrays,
                        "ms_per_frame": round(t_ms, 4)})
    if len(results) < 2:
        # still record whatever happened so the window isn't silent
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"error": "fewer than 2 sweep points completed",
                       "points": results}, f, indent=1)
        print(json.dumps({"metric": "tau_op_ns", "value": None,
                          "error": "sweep incomplete"}))
        return

    # least-squares slope over all points, plus the piecewise slopes
    import numpy as np
    xs = np.array([r["dummy_ops"] for r in results], float)
    ys = np.array([r["ms_per_frame"] for r in results], float)
    A = np.stack([xs, np.ones_like(xs)], axis=1)
    (slope_ms, t0_ms), *_ = np.linalg.lstsq(A, ys, rcond=None)
    tau_op_ns = slope_ms * 1e6 / args.iters_per_frame  # ns per op per iter
    seg = [
        {"from": int(xs[i]), "to": int(xs[i + 1]),
         "ms_per_op": (ys[i + 1] - ys[i]) / (xs[i + 1] - xs[i])}
        for i in range(len(xs) - 1) if xs[i + 1] > xs[i]
    ]
    out = {
        "what": "wall time vs injected dummy VPU ops per merged-loop "
                "iteration (TPT_DUMMY_OPS); slope = in-context cost of "
                "one VPU op = the empirical issue rate",
        "config": "shipped bench default (720x128, K=45, merged, "
                  f"{args.frames}-frame steady-state scan)",
        "points": results,
        "fit": {"t0_ms_per_frame": round(float(t0_ms), 4),
                "slope_ms_per_op_per_frame": float(slope_ms),
                "iters_per_frame": args.iters_per_frame,
                "tau_op_ns_per_iter_lane_block": float(tau_op_ns)},
        "segments": seg,
        "interpretation": "census_ops_cuttable * slope = wall win; "
                          "t0 / slope = effective live ops/frame if "
                          "pure issue-bound",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "tau_op_ns", "value": round(tau_op_ns, 4),
                      "t0_ms": round(float(t0_ms), 3)}))


if __name__ == "__main__":
    main()
