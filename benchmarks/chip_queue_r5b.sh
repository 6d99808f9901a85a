#!/bin/bash
# Round-5 chip queue, part B:
#   1. interlevel_v2_bench — the V2 sweep A/B at the l4 operating point
#                            + full-chunk effect + on-chip bit-identity
#                            (decides whether SWEEP_V2 becomes default);
#   2. parity_trained trajectory x2 fresh seeds — VERDICT r4 #8: the
#                            rounding-seeded-chaos conclusion needs 2-3
#                            control-paired draws (r4d ran seed 7).
set -u
cd /root/repo
LOG=runs/chip_queue_r5b.log
mkdir -p runs
exec >> "$LOG" 2>&1

probe () {
  for i in $(seq 1 120); do
    if timeout 90 python -c "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.arange(100.))))" 2>/dev/null; then
      echo "tunnel OK after probe $i ($(date -u +%H:%M:%S))"; return 0
    fi
    echo "probe $i: tunnel not ready ($(date -u +%H:%M:%S))"; sleep 30
  done
  echo "tunnel NEVER recovered"; return 1
}

echo "=== chip queue r5b start $(date -u +%H:%M:%S) ==="
probe || exit 1

echo "=== verify_shard_select (check_vma fix) $(date -u +%H:%M:%S) ==="
timeout 5400 python -u benchmarks/verify_shard_select.py
echo "verify_shard_select rc=$? $(date -u +%H:%M:%S)"
cp -f "$LOG" benchmarks/logs/chip_queue_r5b.log
probe

echo "=== interlevel_v2_bench $(date -u +%H:%M:%S) ==="
timeout 5400 python -u benchmarks/interlevel_v2_bench.py --reps 3
echo "interlevel_v2_bench rc=$? $(date -u +%H:%M:%S)"
cp -f "$LOG" benchmarks/logs/chip_queue_r5b.log
probe

echo "=== trajectory setup $(date -u +%H:%M:%S) ==="
mkdir -p /tmp/traj
python -u - <<'EOF'
import sys
sys.path.insert(0, "benchmarks")
import os
from train_demo import synth_dataset
h5 = os.path.join("/tmp/traj",
                  "train_poisson_5000_poisson_10000_poisson_20000_"
                  "poisson_40000_poisson_80000.hdf5")
if not os.path.exists(h5):
    synth_dataset(h5, n_shapes=20, seed=7)
print("train h5 ready")
EOF
cp -f artifacts/held.hdf5 /tmp/traj/held.hdf5

for SEED in 11 23; do
  echo "=== parity_trained trajectory seed $SEED $(date -u +%H:%M:%S) ==="
  timeout 3600 python -u benchmarks/parity_trained.py \
    --ckpt artifacts/prod_clean_final.npz --held /tmp/traj/held.hdf5 \
    --skip_eval --steps 10 --platform tpu --traj_seed $SEED
  echo "parity_trained seed $SEED rc=$? $(date -u +%H:%M:%S)"
  cp -f "$LOG" benchmarks/logs/chip_queue_r5b.log
  probe
done

echo "=== chip queue r5b DONE $(date -u +%H:%M:%S) ==="
cp -f "$LOG" benchmarks/logs/chip_queue_r5b.log
