#!/bin/bash
# Round-4 closing chip queue, part C — runs AFTER chip_queue_r4b.sh
# drains (one serial program stream; CLAUDE.md).  Two pending on-chip
# measurements:
#   1. select_pallas_bench — the exact-selection Pallas kernel A/B at
#      the conv site (the decision input for the selection default:
#      bit-identical semantics, possibly approx_min_k-class speed);
#   2. parity_trained --skip_eval — queue F: the matched-precision
#      (HIGHEST) 9-step optimizer trajectory vs the reference torch
#      net at trained weights, with its perturbation-control twin.
set -u
cd /root/repo
LOG=runs/chip_queue_r4c.log
mkdir -p runs
exec >> "$LOG" 2>&1

echo "=== chip queue r4c start $(date -u +%H:%M:%S) ==="

for i in $(seq 1 60); do
  if timeout 90 python -c "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.arange(100.))))" 2>/dev/null; then
    echo "tunnel OK after probe $i ($(date -u +%H:%M:%S))"; break
  fi
  echo "probe $i: tunnel not ready ($(date -u +%H:%M:%S))"; sleep 30
done

echo "=== select_pallas_bench $(date -u +%H:%M:%S) ==="
timeout 3600 python -u benchmarks/select_pallas_bench.py --reps 3
echo "select_pallas_bench rc=$? $(date -u +%H:%M:%S)"

echo "=== parity_trained --skip_eval (queue F) $(date -u +%H:%M:%S) ==="
timeout 3600 python -u benchmarks/parity_trained.py \
  --ckpt artifacts/prod_clean_final.npz \
  --held artifacts/held.hdf5 --platform tpu --skip_eval
echo "parity_trained rc=$? $(date -u +%H:%M:%S)"

echo "=== chip queue r4c DONE $(date -u +%H:%M:%S) ==="
