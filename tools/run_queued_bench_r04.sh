#!/bin/bash
# Round-4 queued TPU measurement suite. Fired ONCE by tools/arm_queued_bench.sh
# on the first healthy relay probe (or run by hand after probing with:
#   timeout 60 python -c "import jax; print(jax.devices())").
#
# Covers VERDICT r3 items:
#   #1 driver-style inference + train bench JSONs (the >=5x capture)
#   #2 saved-residual flash backward re-timing (remat sweep vs the
#      pre-change 260.7 ms device-busy record)
# Outputs land in /root/repo/queued_bench_r04/ and get committed by the
# builder when the run completes.
set -u
OUT=/root/repo/queued_bench_r04
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== 0. device probe ==" | tee "$OUT/probe.txt"
timeout 120 python -c "import jax,time; t=time.time(); d=jax.devices(); print(d, f'{time.time()-t:.1f}s')" 2>&1 | tee -a "$OUT/probe.txt"

echo "== 1. inference bench (headline JSON; measures the candidate modes too) =="
timeout 1500 python bench.py 2> "$OUT/bench_infer.log" | tee "$OUT/bench_infer.json"

echo "== 2. train bench JSON (save_attn_qkv — saved-residual bwd) =="
timeout 1500 python bench.py --train --steps 15 \
    2> "$OUT/bench_train.log" | tee "$OUT/bench_train.json"

echo "== 3. train-step remat sweep (saved-residual bwd re-timing) =="
timeout 1800 python tools/bench_train_step.py \
    --remat full save_attn save_attn_qkv --steps 12 2>&1 | tee "$OUT/remat_sweep.txt"

echo "== 3b. A/B: recompute backward (pre-5d2e104 form) at the same configs =="
timeout 1800 env GAVA_FLASH_BWD=recompute python tools/bench_train_step.py \
    --remat full save_attn_qkv --steps 12 2>&1 | tee "$OUT/remat_sweep_recompute.txt"

echo "== 4. scan_unroll sweep at save_attn_qkv =="
timeout 1200 python tools/bench_train_step.py \
    --remat save_attn_qkv --steps 12 --unroll 12 2>&1 | tee "$OUT/unroll12.txt"

echo "== 5. serving batch sweep with the denominator-fused kernel =="
timeout 1200 python tools/bench_pm_sweep.py 2>&1 | tee "$OUT/pm_sweep.txt"

echo "== 6. per-layer bwd kernel self-time at the flagship remat mode =="
timeout 1200 python tools/profile_train.py --remat save_attn_qkv 2>&1 \
    | tee "$OUT/profile_train.txt"

# (former steps 6b-6d — env-flagged candidate bench runs — are gone:
# bench.py measures the int8-QK and fused-extras candidates as its own
# gated modes in step 1, with per-mode jit closures; env-arming them also
# contaminated the baseline labels)

echo "== 6e. block-size autotune at the serving shapes =="
timeout 1200 python tools/autotune_kernels.py 2>&1 | tee "$OUT/autotune.txt"

echo "== 6f. per-component w8a8 ablation (refreshed ceiling table) =="
timeout 1200 python tools/ablate_w8a8.py 2>&1 | tee "$OUT/ablate_w8a8.txt"

echo "== 6g. caption decode: KV-cached while_loop vs host loop =="
timeout 900 python tools/bench_decode.py 2>&1 | tee "$OUT/bench_decode.txt"

echo "== 7. HTTP server load test on TPU (flagship w8a8) =="
timeout 1200 python tools/loadtest_server.py --full --quantize w8a8 \
    --clients 16 --requests 10 --batch_size 16 \
    2> "$OUT/loadtest_tpu.log" | tee "$OUT/loadtest_tpu.json"

echo "== queued bench r04 done =="

echo "== decision summary =="
python tools/analyze_queued_bench.py "$OUT" 2>&1 | tee "$OUT/DECISIONS.md"

# self-commit the artifacts: the watcher may fire while the builder session
# is idle, and a recorded healthy window must not depend on anyone noticing
cd /root/repo
git add queued_bench_r04
git commit -m "queued bench r04: TPU measurements from the first healthy relay window

Captured by tools/arm_queued_bench.sh (self-arming probe loop): inference
and train bench JSONs, saved-residual vs recompute flash-backward A/B,
int8-QK and fused-extras candidate A/Bs, scan-unroll and batch sweeps,
kernel block-size autotune, per-kernel profile, TPU server load test." \
    || echo "nothing to commit"
