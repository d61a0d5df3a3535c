#!/bin/bash
# One TPU measurement window, cheapest/highest-info first, every step
# under its own timeout so a tunnel flake doesn't wedge the queue.
# Run: bash tools/tpu_session.sh 2>&1 | tee build/tpu_session.log
set -x
cd "$(dirname "$0")/.."
mkdir -p build

# 0. liveness probe (fail fast if the tunnel is down)
timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# 1. forward bench, K=1 baseline (compile cached from round 1)
BENCH_REPS=4 timeout 1800 python bench.py > build/bench_k1.json

# 2. pix-per-lane ladder on the real chip
for kt in "2 16,128" "3 24,128" "5 40,128" "9 72,128"; do
  set -- $kt
  BENCH_PPL=$1 BENCH_TILE=$2 BENCH_REPS=4 timeout 2400 python bench.py \
    > "build/bench_k$1.json"
done

# 3. Pallas-vs-jnp parity artifact (VERDICT item 6)
timeout 1800 python tools/tpu_parity.py

# 4. measured VPU roofline (VERDICT item 3a)
timeout 2400 python tools/vpu_roofline.py

# 5. compiled occupancy counters must equal the interpret-mode ones
timeout 1800 python tools/occupancy.py

# 6. fwd+bwd with the Pallas gradient kernel (VERDICT item 1)
timeout 3000 python tools/bench_grad.py --backend pallas --frames 2 --reps 3 \
  > build/bench_grad_pallas.json
timeout 1800 python tools/bench_grad.py --backend jnp --frames 2 --reps 3 \
  > build/bench_grad_jnp.json

# summary table of the K-sweep
python - <<'EOF'
import glob, json
for p in sorted(glob.glob("build/bench_k*.json")):
    try:
        d = json.load(open(p))
        print(f"{p}: {d['value']} {d['unit']}")
    except Exception as e:
        print(f"{p}: unreadable ({e})")
EOF

echo TPU-SESSION-DONE
