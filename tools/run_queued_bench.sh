#!/bin/bash
# One-shot runner for the queued TPU measurements (run when the relay is
# healthy — probe first with: timeout 60 python -c "import jax; print(jax.devices())").
# Captures everything under /tmp/queued_bench/.
set -u
OUT=/root/repo/queued_bench_r03
mkdir -p $OUT
cd "$(dirname "$0")/.."

echo "== 1. train-step remat sweep (saved-residual bwd) =="
timeout 1500 python tools/bench_train_step.py \
    --remat full save_attn_qkv --steps 12 2>&1 | tee $OUT/remat_sweep.txt

echo "== 2. scan_unroll sweep at save_attn_qkv =="
timeout 1200 python tools/bench_train_step.py \
    --remat save_attn_qkv --steps 12 --unroll 12 2>&1 | tee $OUT/unroll12.txt

echo "== 3. inference bench =="
timeout 1200 python bench.py 2>&1 | tee $OUT/bench_infer.json

echo "== 4. train bench JSON =="
timeout 1200 python bench.py --train --steps 15 2>&1 | tee $OUT/bench_train.json

echo "== queued bench done =="

echo "== 5. batch sweep with the denominator-fused kernel =="
timeout 1200 python tools/bench_pm_sweep.py 2>&1 | tee $OUT/pm_sweep.txt
