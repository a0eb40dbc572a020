"""tools/analyze_queued_bench.py decision logic on synthetic artifacts —
this script turns the queued TPU measurements into keep/revert/flip
decisions (VERDICT r3), so its parsing must be pinned: a regex slip would
silently misreport which flash-backward mode or serving candidate won.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(outdir):
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/analyze_queued_bench.py"),
         str(outdir)],
        capture_output=True, text=True, timeout=60)
    assert p.returncode == 0, p.stderr[-500:]
    return p.stdout


def test_decisions_from_synthetic_artifacts(tmp_path):
    with open(tmp_path / "bench_infer.json", "w") as f:
        f.write("warmup noise\n")
        f.write(json.dumps({
            "metric": "clips", "value": 771.2, "unit": "clips/s",
            "vs_baseline": 5.78,
            "extra": {"mode": "w8a8+patch_major+fused_extras",
                      "clips_per_sec_w8a8_patch_major": 768.8,
                      "clips_per_sec_fused_extras": 771.2,
                      "clips_per_sec_fused_extras_int8_qk": 741.0,
                      "fxqk_prob_delta_vs_bf16": 0.06}}) + "\n")
    with open(tmp_path / "bench_train.json", "w") as f:
        f.write(json.dumps({"metric": "ms", "value": 259.3, "unit": "ms",
                            "vs_baseline": 3.06, "extra": {}}) + "\n")
    with open(tmp_path / "remat_sweep.txt", "w") as f:
        f.write("remat=full  donate=True attn=flash: median 290.1 ms  (13.8 clips/s)\n"
                "remat=save_attn_qkv donate=True attn=flash: median 262.7 ms  (15.2 clips/s)\n")
    with open(tmp_path / "remat_sweep_recompute.txt", "w") as f:
        f.write("remat=save_attn_qkv donate=True attn=flash: median 270.3 ms  (14.8 clips/s)\n")

    out = _run(tmp_path)
    assert "771.2" in out and "5x north star (667): MET" in out
    assert "fused_extras WINS" in out
    assert "+int8_qk loses" in out
    assert "GATE FAIL: fxqk_prob_delta_vs_bf16" in out
    assert "target<=300: MET" in out and "stretch<=262.7: MET" in out
    # saved 262.7 <= recompute 270.3 at the flagship mode
    assert "remat=save_attn_qkv: saved=262.7 ms, recompute=270.3 ms  " \
           "KEEP saved-residual" in out


def test_decisions_outage_artifacts(tmp_path):
    with open(tmp_path / "bench_infer.json", "w") as f:
        f.write(json.dumps({"metric": "clips", "value": None,
                            "unit": "clips/s", "vs_baseline": None,
                            "error": "TPU backend init did not complete"}) + "\n")
    out = _run(tmp_path)
    assert "no healthy capture" in out
    assert "TPU backend init" in out


def test_decisions_revert_when_recompute_faster(tmp_path):
    with open(tmp_path / "remat_sweep.txt", "w") as f:
        f.write("remat=save_attn_qkv donate=True attn=flash: median 275.0 ms\n")
    with open(tmp_path / "remat_sweep_recompute.txt", "w") as f:
        f.write("remat=save_attn_qkv donate=True attn=flash: median 261.0 ms\n")
    out = _run(tmp_path)
    assert "REVERT to recompute" in out
