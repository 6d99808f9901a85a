#!/bin/bash
# Round-5 chip queue, part A — the verification debts VERDICT r4 names:
#   1. tpu_checks          — full on-chip kernel regression at the
#                            shipped defaults; must now be GREEN: the
#                            select kernel row-tiles itself (the r4e
#                            (624,640) k=33 scoped-VMEM OOM fix);
#   2. verify_shard_select — chip evidence for the round-4 shard_select
#                            rewiring (the r4e leg died on an import
#                            path bug before doing anything);
#   3. train_production    — 10k-step segment re-run with per-window
#                            rates printed (separate compile from
#                            steady; log_with_pred=False so the monitor
#                            variant no longer doubles the compile
#                            bill) — the committed analysis VERDICT #2
#                            demands;
#   4. bench.py            — headline guard: the kernel change keeps
#                            whole-block programs byte-identical; prove
#                            no regression in the same session.
# One serial stream (CLAUDE.md: single host core + tunnel queue);
# tunnel probe between legs so a wedged leg doesn't poison the next.
set -u
cd /root/repo
LOG=runs/chip_queue_r5a.log
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

echo "=== chip queue r5a start $(date -u +%H:%M:%S) ==="
probe || exit 1

echo "=== tpu_checks (row-tiled select kernel) $(date -u +%H:%M:%S) ==="
timeout 5400 python -u benchmarks/tpu_checks.py
echo "tpu_checks rc=$? $(date -u +%H:%M:%S)"
cp -f "$LOG" benchmarks/logs/chip_queue_r5a.log
probe

echo "=== verify_shard_select $(date -u +%H:%M:%S) ==="
timeout 5400 python -u benchmarks/verify_shard_select.py
echo "verify_shard_select rc=$? $(date -u +%H:%M:%S)"
cp -f "$LOG" benchmarks/logs/chip_queue_r5a.log
probe

echo "=== train_production 10k segment (window rates) $(date -u +%H:%M:%S) ==="
timeout 5400 python -u benchmarks/train_production.py --worker \
  --steps 10000 --stage_steps 1250 --workdir /tmp/prod_rate_r5a
echo "train_production rc=$? $(date -u +%H:%M:%S)"
cp -f "$LOG" benchmarks/logs/chip_queue_r5a.log
probe

echo "=== bench.py (headline guard) $(date -u +%H:%M:%S) ==="
timeout 3600 python -u bench.py
echo "bench rc=$? $(date -u +%H:%M:%S)"

echo "=== chip queue r5a DONE $(date -u +%H:%M:%S) ==="
cp -f "$LOG" benchmarks/logs/chip_queue_r5a.log
