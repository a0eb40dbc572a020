#!/bin/bash
# Self-arming queued bench (VERDICT r3 #1): probe the TPU relay every
# ~14 min; on a healthy probe, fire tools/run_queued_bench_r04.sh. If the
# window closes mid-suite (headline JSON null / missing), RE-ARM and try
# again on the next healthy window instead of giving up — short windows
# must not eat the round. Attempts are logged to
# queued_bench_r04/attempts.log.
set -u
OUT=/root/repo/queued_bench_r04
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
LOG=$OUT/attempts.log
MAX_TRIES=${MAX_TRIES:-44}          # 44 x 15 min ~ 11 h: the whole round
PROBE_TIMEOUT=${PROBE_TIMEOUT:-120}

headline_ok() {
  python - <<'EOF'
import json, sys
try:
    lines = [l for l in open("/root/repo/queued_bench_r04/bench_infer.json")
             if l.strip().startswith("{")]
    v = json.loads(lines[-1])["value"]
    sys.exit(0 if v else 1)
except Exception:
    sys.exit(1)
EOF
}

for i in $(seq 1 "$MAX_TRIES"); do
  echo "[$(date -u +%FT%TZ)] probe $i/$MAX_TRIES" >> "$LOG"
  if timeout "$PROBE_TIMEOUT" python -c \
      "import jax,time; t=time.time(); d=jax.devices(); print(d, f'{time.time()-t:.1f}s')" \
      >> "$LOG" 2>&1; then
    echo "[$(date -u +%FT%TZ)] relay HEALTHY — firing queued bench" >> "$LOG"
    bash tools/run_queued_bench_r04.sh > "$OUT/run_$i.log" 2>&1
    rc=$?
    echo "[$(date -u +%FT%TZ)] queued bench finished rc=$rc" >> "$LOG"
    if headline_ok; then
      echo "[$(date -u +%FT%TZ)] headline captured — disarming" >> "$LOG"
      exit 0
    fi
    echo "[$(date -u +%FT%TZ)] headline null/missing (window closed?) — re-arming" >> "$LOG"
  else
    echo "[$(date -u +%FT%TZ)] probe failed (outage persists)" >> "$LOG"
  fi
  sleep "${SLEEP_S:-840}"
done
echo "[$(date -u +%FT%TZ)] gave up after $MAX_TRIES probes" >> "$LOG"
exit 1
