#!/bin/bash
# Watch for the TPU tunnel to come back and immediately capture the
# round's priority measurements (highest value first), so a short
# tunnel window is never wasted.  Probes in a subprocess under timeout
# because a downed tunnel HANGS jax.devices() rather than raising.
# Run: nohup bash tools/tunnel_watch.sh >> build/tunnel_watch.log 2>&1 &
cd "$(dirname "$0")/.."
mkdir -p build
while true; do
  if timeout 120 python -c \
      "import jax; assert jax.devices()[0].platform == 'tpu'" \
      2>/dev/null; then
    echo "tunnel UP at $(date)"
    # 1. forward certification run (the round's headline; bench.py's
    #    own retry/watchdog armor handles mid-run flakes)
    BENCH_REPS=4 timeout 2700 python bench.py \
      > build/bench_r5_certify.json 2> build/bench_r5_certify.err
    echo "bench: $(cat build/bench_r5_certify.json)"
    # 2. fwd+bwd ladder: wavefront (round-5 route) vs merged-lockstep
    #    vs round-4 unmerged
    timeout 3000 python tools/bench_grad.py --backend pallas --frames 48 \
      --reps 3 --merged 1 --wavefront 1 \
      > build/bench_grad_wavefront.json 2>> build/tunnel_watch_grad.err
    timeout 3000 python tools/bench_grad.py --backend pallas --frames 48 \
      --reps 3 --merged 1 \
      > build/bench_grad_merged.json 2>> build/tunnel_watch_grad.err
    timeout 3000 python tools/bench_grad.py --backend pallas --frames 48 \
      --reps 3 --merged 0 \
      > build/bench_grad_unmerged.json 2>> build/tunnel_watch_grad.err
    echo "grad ladder done at $(date)"
    for f in build/bench_grad_*.json; do echo "$f: $(cat "$f")"; done
    echo "WATCH-DONE"
    break
  fi
  echo "tunnel still down at $(date)"
  sleep 300
done
