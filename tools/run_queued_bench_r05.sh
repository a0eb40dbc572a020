#!/bin/bash
# Round-5 queued TPU measurement suite. Run by hand after probing relay
# health (timeout 60 python -c "import jax; print(jax.devices())"), or via
# tools/arm_queued_bench.sh.
#
# Covers VERDICT r4 items:
#   #1 e2e training-driver run (cli/train.py, host data path in the loop)
#      — now with the H2D prefetch thread (data/device_prefetch.py)
#   #2 e2e zero-shot eval pipeline incl. real decode + decoded-view cache
#   #5 TPU server loadtest with host-path breakdown + raw/bucket A/Bs
#   #7 autotune re-run with classified failure rows
# Outputs land in /root/repo/queued_bench_r05/ and are self-committed.
set -u
OUT=/root/repo/queued_bench_r05
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== 0. device probe ==" | tee "$OUT/probe.txt"
timeout 120 python -c "import jax,time; t=time.time(); d=jax.devices(); print(d, f'{time.time()-t:.1f}s')" 2>&1 | tee -a "$OUT/probe.txt"

echo "== 1. inference bench (headline JSON, r5 skip markers) =="
timeout 1500 python bench.py 2> "$OUT/bench_infer.log" | tee "$OUT/bench_infer.json"

echo "== 2. train bench JSON (closure evidence for the 261 ms end state) =="
timeout 1500 python bench.py --train --steps 15 \
    2> "$OUT/bench_train.log" | tee "$OUT/bench_train.json"

echo "== 3. e2e training driver (VERDICT r4 #1; prefetch overlap) =="
timeout 2400 python tools/run_e2e_train.py --steps 120 \
    --eval-freq 60 --save-freq 60 \
    --out queued_bench_r05/e2e_train.json 2>&1 | tail -40 \
    | tee "$OUT/e2e_train.log"

echo "== 4. e2e zero-shot eval pipeline (VERDICT r4 #2) =="
timeout 2400 python tools/run_e2e_eval.py \
    --out queued_bench_r05/e2e_eval.json 2>&1 | tail -30 \
    | tee "$OUT/e2e_eval.log"

echo "== 5. TPU server loadtest: npy+buckets (the new default) =="
timeout 1800 python tools/loadtest_server.py --full --quantize w8a8 \
    --clients 16 --requests 10 --batch_size 16 \
    2> "$OUT/loadtest_tpu.log" | tee "$OUT/loadtest_tpu.json"

echo "== 5b. A/B: raw endpoint (no .npy parse) =="
timeout 1800 python tools/loadtest_server.py --full --quantize w8a8 --raw \
    --clients 16 --requests 10 --batch_size 16 \
    2>> "$OUT/loadtest_tpu.log" | tee "$OUT/loadtest_tpu_raw.json"

echo "== 5c. A/B: buckets OFF (the r4 behavior: pad every batch to 16) =="
timeout 1800 python tools/loadtest_server.py --full --quantize w8a8 \
    --no_buckets --clients 16 --requests 10 --batch_size 16 \
    2>> "$OUT/loadtest_tpu.log" | tee "$OUT/loadtest_tpu_nobuckets.json"

echo "== 6. autotune re-run (classified failure rows, VERDICT r4 #7) =="
timeout 1800 python tools/autotune_kernels.py 2>&1 | tee "$OUT/autotune.txt"

echo "== queued bench r05 done =="

cd /root/repo
git add queued_bench_r05
git commit -m "queued bench r05: TPU measurements from a healthy relay window

e2e training-driver and eval-pipeline captures (host data path in the
loop), TPU server loadtest with host-path breakdown plus raw-endpoint and
padding-bucket A/Bs, and the classified autotune re-run." \
    || echo "nothing to commit"
