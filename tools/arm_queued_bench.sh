#!/bin/bash
# Self-arming queued bench (VERDICT r3 #1): probe the TPU relay every
# ~15 min; on the FIRST healthy probe, fire tools/run_queued_bench_r04.sh
# once and exit. An outage window can no longer eat the round — the run
# arms itself and captures the first healthy window automatically.
# Attempts are logged to queued_bench_r04/attempts.log.
set -u
OUT=/root/repo/queued_bench_r04
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
LOG=$OUT/attempts.log
MAX_TRIES=${MAX_TRIES:-44}          # 44 x 15 min ~ 11 h: the whole round
PROBE_TIMEOUT=${PROBE_TIMEOUT:-120}

for i in $(seq 1 "$MAX_TRIES"); do
  echo "[$(date -u +%FT%TZ)] probe $i/$MAX_TRIES" >> "$LOG"
  if timeout "$PROBE_TIMEOUT" python -c \
      "import jax,time; t=time.time(); d=jax.devices(); print(d, f'{time.time()-t:.1f}s')" \
      >> "$LOG" 2>&1; then
    echo "[$(date -u +%FT%TZ)] relay HEALTHY — firing queued bench" >> "$LOG"
    bash tools/run_queued_bench_r04.sh > "$OUT/run.log" 2>&1
    rc=$?
    echo "[$(date -u +%FT%TZ)] queued bench finished rc=$rc" >> "$LOG"
    exit $rc
  fi
  echo "[$(date -u +%FT%TZ)] probe failed (outage persists)" >> "$LOG"
  sleep "${SLEEP_S:-840}"
done
echo "[$(date -u +%FT%TZ)] gave up after $MAX_TRIES probes" >> "$LOG"
exit 1
