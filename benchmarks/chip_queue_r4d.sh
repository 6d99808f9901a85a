#!/bin/bash
# Round-4 closing chip queue, part D — after the select-kernel default
# flip (ops/knn.py EXACT_SELECT_PALLAS=True, k-cap 64).  One serial
# stream (CLAUDE.md):
#   1. bench.py             — fresh-process headline + TTFS at the NEW
#                             default (the in-process e2e A/B showed
#                             59.0k -> 75.3k pts/s uncapped);
#   2. select_cap_bench     — price the k-cap 64 vs 512 end to end;
#   3. select_train_bench   — the train step A/B (new backward program:
#                             custom-VJP scatter vs fused top_k grad);
#   4. parity_trained (queue F) — matched-precision 9-step trajectory
#                             vs reference torch at trained weights;
#   5. quality_head2head    — the flagship 16x curriculum head-to-head
#                             (VERDICT #5), threepu-on-chip/torch-CPU.
set -u
cd /root/repo
LOG=runs/chip_queue_r4d.log
mkdir -p runs
exec >> "$LOG" 2>&1

echo "=== chip queue r4d start $(date -u +%H:%M:%S) ==="

for i in $(seq 1 60); do
  if timeout 90 python -c "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.arange(100.))))" 2>/dev/null; then
    echo "tunnel OK after probe $i ($(date -u +%H:%M:%S))"; break
  fi
  echo "probe $i: tunnel not ready ($(date -u +%H:%M:%S))"; sleep 30
done

echo "=== bench.py (fresh-process, new default) $(date -u +%H:%M:%S) ==="
timeout 1800 python -u bench.py
echo "bench rc=$? $(date -u +%H:%M:%S)"
cp -f "$LOG" benchmarks/logs/chip_queue_r4d.log

echo "=== select_cap_bench $(date -u +%H:%M:%S) ==="
timeout 2400 python -u benchmarks/select_cap_bench.py --reps 2
echo "select_cap_bench rc=$? $(date -u +%H:%M:%S)"
cp -f "$LOG" benchmarks/logs/chip_queue_r4d.log

echo "=== select_train_bench $(date -u +%H:%M:%S) ==="
timeout 2400 python -u benchmarks/select_train_bench.py
echo "select_train_bench rc=$? $(date -u +%H:%M:%S)"
cp -f "$LOG" benchmarks/logs/chip_queue_r4d.log

echo "=== parity_trained --skip_eval (queue F) $(date -u +%H:%M:%S) ==="
timeout 3600 python -u benchmarks/parity_trained.py \
  --ckpt artifacts/prod_clean_final.npz \
  --held runs/prod_clean/held.hdf5 --platform tpu --skip_eval
echo "parity_trained rc=$? $(date -u +%H:%M:%S)"
cp -f "$LOG" benchmarks/logs/chip_queue_r4d.log

echo "=== quality_head2head 16x curriculum $(date -u +%H:%M:%S) ==="
timeout 7200 python -u benchmarks/quality_head2head.py \
  --ratio 16 --curriculum --steps 400 --batch 4 --platform tpu
echo "head2head rc=$? $(date -u +%H:%M:%S)"
cp -f "$LOG" benchmarks/logs/chip_queue_r4d.log

echo "=== chip queue r4d DONE $(date -u +%H:%M:%S) ==="
cp -f "$LOG" benchmarks/logs/chip_queue_r4d.log
