"""Summarize queued_bench_r04 artifacts into a decision table.

Run after tools/run_queued_bench_r04.sh completes (the armed watcher
self-commits the raw artifacts): prints which serving mode won (and
whether the 5x north star is met), the saved-vs-recompute flash-backward
verdict, the unroll/batch sweep picks, and flags any gate failures —
the keep/revert/flip-default decisions VERDICT r3 asks for, in one place.
"""

import json
import os
import re
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/queued_bench_r04"


def last_json_line(path):
    try:
        with open(path) as f:
            lines = [l.strip() for l in f if l.strip().startswith("{")]
        return json.loads(lines[-1]) if lines else None
    except (OSError, json.JSONDecodeError):
        return None


def main():
    infer = last_json_line(os.path.join(OUT, "bench_infer.json"))
    train = last_json_line(os.path.join(OUT, "bench_train.json"))

    print("# queued bench r04 — decision summary\n")
    if infer and infer.get("value"):
        ex = infer.get("extra", {})
        print(f"## Inference headline: {infer['value']} clips/s "
              f"({infer['vs_baseline']}x) — mode: {ex.get('mode')}")
        print(f"  5x north star (667): "
              f"{'MET' if infer['vs_baseline'] >= 5.0 else 'NOT met'}")
        for k in ("clips_per_sec_bf16", "clips_per_sec_w8a8",
                  "clips_per_sec_w8a8_patch_major",
                  "clips_per_sec_fused_extras",
                  "clips_per_sec_fused_extras_int8_qk"):
            if k in ex:
                print(f"  {k}: {ex[k]}")
        for k in ("w8a8_prob_delta_vs_bf16", "pm_prob_delta_vs_bf16",
                  "fx_prob_delta_vs_bf16", "fxqk_prob_delta_vs_bf16"):
            v = ex.get(k)
            if v is not None and v > 0.05:
                print(f"  !! GATE FAIL: {k} = {v}")
        pm = ex.get("clips_per_sec_w8a8_patch_major") or 0
        fx = ex.get("clips_per_sec_fused_extras") or 0
        fxqk = ex.get("clips_per_sec_fused_extras_int8_qk") or 0
        if fx or fxqk:
            print(f"  candidate verdicts: fused_extras "
                  f"{'WINS' if fx > pm else 'loses'} ({fx} vs {pm}); "
                  f"+int8_qk {'WINS' if fxqk > max(pm, fx) else 'loses'} "
                  f"({fxqk})")
    else:
        print("## Inference: no healthy capture "
              f"({infer.get('error') if infer else 'missing artifact'})")

    if train and train.get("value"):
        ex = train.get("extra", {})
        print(f"\n## Train: {train['value']} ms/step "
              f"({train['vs_baseline']}x GPU est.) — "
              f"target<=300: {'MET' if train['value'] <= 300 else 'NOT met'}"
              f"; stretch<=262.7: "
              f"{'MET' if train['value'] <= 262.7 else 'not met'}")
    else:
        print("\n## Train: no healthy capture")

    # remat sweep: saved vs recompute backward
    def sweep_times(fname):
        try:
            txt = open(os.path.join(OUT, fname)).read()
        except OSError:
            return {}
        return {m.group(1): float(m.group(2)) for m in re.finditer(
            r"remat=(\S+).*?([\d.]+)\s*ms", txt)}

    saved = sweep_times("remat_sweep.txt")
    rec = sweep_times("remat_sweep_recompute.txt")
    if saved or rec:
        print("\n## Flash backward A/B (VERDICT r3 #2)")
        for k in sorted(set(saved) | set(rec)):
            s, r = saved.get(k), rec.get(k)
            verdict = ""
            if s and r:
                verdict = ("KEEP saved-residual" if s <= r
                           else "REVERT to recompute")
            print(f"  remat={k}: saved={s} ms, recompute={r} ms  {verdict}")

    for extra in ("unroll12.txt", "pm_sweep.txt", "autotune.txt",
                  "ablate_w8a8.txt", "bench_decode.txt",
                  "loadtest_tpu.json", "profile_train.txt"):
        p = os.path.join(OUT, extra)
        if os.path.exists(p):
            print(f"\n## {extra} (tail)")
            lines = open(p).read().strip().splitlines()
            for l in lines[-8:]:
                print(f"  {l}")


if __name__ == "__main__":
    main()
