#!/bin/bash
# One TPU measurement window, cheapest/highest-info first, every step
# under its own timeout so a tunnel flake doesn't wedge the queue.
# Run: bash tools/tpu_session.sh 2>&1 | tee build/tpu_session.log
#
# Round-4 protocol: every throughput number uses the STEADY-STATE
# measurement (BENCH_FRAMES=384, bench.py default) -- each timed device
# call carries a fixed ~250-390 ms dispatch+transfer floor through the
# tunnel, so short runs understate throughput ~2x and carry most of the
# old "tunnel noise" (docs/measured/bench_frames_r4.json).
set -x
cd "$(dirname "$0")/.."
mkdir -p build

# 0. liveness probe (fail fast if the tunnel is down)
timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# 1. forward bench, shipped config (720x128, K=45, merged, 384 frames)
BENCH_REPS=4 timeout 1800 python bench.py > build/bench_shipped.json

# 2. shape ladder around the shipped point (catches regressions and
#    device-generation shifts; see docs/measured/bench_tile_r4.json)
for cfg in "15 120,128 0" "15 360,128 0" "45 720,128 0" "45 720,128 1" \
           "30 720,128 1"; do
  set -- $cfg
  BENCH_PPL=$1 BENCH_TILE=$2 BENCH_MERGED=$3 BENCH_REPS=3 \
    timeout 2400 python bench.py > "build/bench_k$1_t${2%%,*}_m$3.json"
done

# 3. Pallas-vs-jnp parity artifact (distribution-level gate)
timeout 1800 python tools/tpu_parity.py

# 4. measured VPU roofline
timeout 2400 python tools/vpu_roofline.py

# 5. compiled occupancy counters must equal the interpret-mode ones;
#    also record the shipped-shape occupancy
timeout 1800 python tools/occupancy.py
timeout 1800 python tools/occupancy.py --ppl 45 --tile 720,128 \
  --out build/occupancy_shipped.json

# 6. fwd+bwd with the Pallas gradient kernel (steady-state frames);
#    round 5: merged differentiable route A/B (bounce_parts_merged)
timeout 3000 python tools/bench_grad.py --backend pallas --frames 48 \
  --reps 3 --merged 1 > build/bench_grad_pallas_merged.json
timeout 3000 python tools/bench_grad.py --backend pallas --frames 48 \
  --reps 3 --merged 0 > build/bench_grad_pallas.json
timeout 1800 python tools/bench_grad.py --backend jnp --frames 12 \
  --reps 3 > build/bench_grad_jnp.json

# 7. round-5 empirical issue-rate / headroom model (dummy-op slope);
#    worst case 5 points x 1200 s per-point budget
timeout 7200 python tools/issue_slope.py

# 8. round-5 differentiable WAVEFRONT (the big backward lever: refill +
#    early-exit in the reverse-differentiable loop)
timeout 3000 python tools/bench_grad.py --backend pallas --frames 48 \
  --reps 3 --merged 1 --wavefront 1 \
  > build/bench_grad_pallas_wavefront.json

# 9. depth-tail early-out A/B on the LOCKSTEP gradient kernel (opt-in
#    knob; known-fragile on XLA:CPU, the hypothesis is TPU-only)
TPT_DIFF_SKIP_DEAD=1 timeout 3000 python tools/bench_grad.py \
  --backend pallas --frames 48 --reps 3 --merged 1 \
  > build/bench_grad_pallas_merged_skipdead.json

# summary table of the sweep
python - <<'EOF'
import glob, json
for p in sorted(glob.glob("build/bench_*.json")):
    try:
        d = json.load(open(p))
        print(f"{p}: {d['value']} {d['unit']}")
    except Exception as e:
        print(f"{p}: unreadable ({e})")
EOF

echo TPU-SESSION-DONE
