#!/bin/bash
# Round-4 closing chip queue, part E — follow-ups after the r4d queue:
#   1. tpu_checks        — full on-chip kernel re-verification at the
#                          shipped defaults (select kernel now ON);
#   2. select_cap_bench  — the k-cap 64 vs 512 pricing (r4d leg crashed
#                          on a signature bug, now fixed);
#   3. train_production 10k-step segment — the real production loop
#                          rate at the new default (the 35.9 steps/s
#                          claim predates the select kernel; the
#                          pipelined A/B measured 45.0 -> 64.7);
#   4. eval_gap          — re-attribute the x16 chunk at the new
#                          default (what is the next lever after the
#                          selection sites halved?).
# One serial stream (CLAUDE.md: single host core + tunnel queue).
set -u
cd /root/repo
LOG=runs/chip_queue_r4e.log
mkdir -p runs
exec >> "$LOG" 2>&1

echo "=== chip queue r4e start $(date -u +%H:%M:%S) ==="

for i in $(seq 1 120); do
  if timeout 90 python -c "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.arange(100.))))" 2>/dev/null; then
    echo "tunnel OK after probe $i ($(date -u +%H:%M:%S))"; break
  fi
  echo "probe $i: tunnel not ready ($(date -u +%H:%M:%S))"; sleep 30
done

echo "=== verify shard_select on chip $(date -u +%H:%M:%S) ==="
timeout 3000 python -u /tmp/verify_shard_select.py
echo "verify_shard_select rc=$? $(date -u +%H:%M:%S)"
cp -f "$LOG" benchmarks/logs/chip_queue_r4e.log

echo "=== tpu_checks $(date -u +%H:%M:%S) ==="
timeout 3600 python -u benchmarks/tpu_checks.py
echo "tpu_checks rc=$? $(date -u +%H:%M:%S)"
cp -f "$LOG" benchmarks/logs/chip_queue_r4e.log

echo "=== select_cap_bench (fixed) $(date -u +%H:%M:%S) ==="
timeout 2400 python -u benchmarks/select_cap_bench.py --reps 2
echo "select_cap_bench rc=$? $(date -u +%H:%M:%S)"
cp -f "$LOG" benchmarks/logs/chip_queue_r4e.log

echo "=== train_production 10k segment (rate at new default) $(date -u +%H:%M:%S) ==="
timeout 3600 python -u benchmarks/train_production.py --worker \
  --steps 10000 --stage_steps 1250 --workdir /tmp/prod_rate_r4e
echo "train_production rc=$? $(date -u +%H:%M:%S)"
cp -f "$LOG" benchmarks/logs/chip_queue_r4e.log

echo "=== eval_gap (re-attribution at new default) $(date -u +%H:%M:%S) ==="
timeout 3600 python -u benchmarks/eval_gap.py --reps 3
echo "eval_gap rc=$? $(date -u +%H:%M:%S)"
cp -f "$LOG" benchmarks/logs/chip_queue_r4e.log

echo "=== chip queue r4e DONE $(date -u +%H:%M:%S) ==="
cp -f "$LOG" benchmarks/logs/chip_queue_r4e.log
