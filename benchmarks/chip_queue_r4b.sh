#!/bin/bash
# Round-4 closing chip queue (second session: /tmp and runs/ were wiped,
# so the production checkpoints are re-trained before the pending
# measurements — queue D (knn_cascade_quality), scan-quality second
# half — can run).  One serial queue: the tunnel executes one program
# stream; concurrent chip clients would interleave and queue-noise
# every number (CLAUDE.md).
set -u
cd /root/repo
LOG=runs/chip_queue_r4b.log
mkdir -p runs
exec >> "$LOG" 2>&1

echo "=== chip queue r4b start $(date -u +%H:%M:%S) ==="

# 1. wait for the tunnel (CLAUDE.md: poll with bounded probes; clients
# hang in backend init while the server drains a killed job's program)
for i in $(seq 1 60); do
  if timeout 90 python -c "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.arange(100.))))" 2>/dev/null; then
    echo "tunnel OK after probe $i ($(date -u +%H:%M:%S))"; break
  fi
  echo "probe $i: tunnel not ready ($(date -u +%H:%M:%S))"; sleep 30
done

# 2. clean production run (the trained-weights anchor)
echo "=== prod_clean 120k $(date -u +%H:%M:%S) ==="
python -u benchmarks/train_production.py --worker --steps 120000 \
  --workdir runs/prod_clean
echo "prod_clean rc=$? $(date -u +%H:%M:%S)"

# snapshot the anchor into the committed tree the moment it exists
mkdir -p artifacts
cp -f runs/prod_clean/model/model_final.npz artifacts/prod_clean_final.npz 2>/dev/null
cp -f runs/prod_clean/held.hdf5 artifacts/held.hdf5 2>/dev/null
cp -f runs/prod_clean/report.json artifacts/prod_clean_report.json 2>/dev/null

# 3. queue D: approx-selection quality gate at trained weights
echo "=== knn_cascade_quality (queue D) $(date -u +%H:%M:%S) ==="
python -u benchmarks/knn_cascade_quality.py \
  --ckpt runs/prod_clean/model/model_final.npz \
  --held runs/prod_clean/held.hdf5 --recalls 0.95
echo "knn_cascade_quality rc=$? $(date -u +%H:%M:%S)"

# 4. jitter production run (the final_scan.pth analogue)
echo "=== prod_scan 120k --jitter $(date -u +%H:%M:%S) ==="
python -u benchmarks/train_production.py --worker --steps 120000 \
  --jitter --workdir runs/prod_scan
echo "prod_scan rc=$? $(date -u +%H:%M:%S)"
cp -f runs/prod_scan/model/model_final.npz artifacts/prod_scan_final.npz 2>/dev/null
cp -f runs/prod_scan/report.json artifacts/prod_scan_report.json 2>/dev/null

# 5. scan-config quality, both checkpoints (closes the RESULTS.md
#    "second half" sentence)
echo "=== scan_quality both ckpts $(date -u +%H:%M:%S) ==="
python -u benchmarks/scan_quality.py \
  --ckpt runs/prod_clean/model/model_final.npz \
  --ckpt_scan runs/prod_scan/model/model_final.npz \
  --held runs/prod_clean/held.hdf5
echo "scan_quality rc=$? $(date -u +%H:%M:%S)"

# 6. headline re-measure in this session's conditions
echo "=== bench.py $(date -u +%H:%M:%S) ==="
python -u bench.py
echo "bench rc=$? $(date -u +%H:%M:%S)"

echo "=== chip queue r4b DONE $(date -u +%H:%M:%S) ==="
