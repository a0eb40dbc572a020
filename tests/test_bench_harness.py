"""bench.py harness behavior (not the measurements): the deadline watchdog
must convert a mid-run hang into a valid partial-results JSON line, because
a wedged relay window otherwise loses every already-measured mode (the
BENCH_r03 failure mode — the driver's timeout leaves an empty stdout)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_deadline_watchdog_emits_partial_line():
    code = """
import bench
partial = {"_metric": bench.INFER_METRIC, "_unit": "clips/s"}
bench._start_deadline_watchdog(partial, 1.5)
partial["clips_per_sec_bf16"] = 495.5
partial["value"] = 495.5
partial["vs_baseline"] = 3.711
partial["mode"] = "bf16"
partial["clips_per_sec_w8a8"] = 700.0
partial["value"] = 700.0
partial["vs_baseline"] = 5.243
partial["mode"] = "w8a8"
import time; time.sleep(30)  # simulates a jit call wedged by the relay
"""
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=25, cwd=REPO)
    assert p.returncode == 3, (p.returncode, p.stderr[-500:])
    line = json.loads(p.stdout.strip().splitlines()[-1])
    assert line["metric"] == ("clips/sec/chip (ViT-B/16, 8-frame, "
                              "zero-shot forward)")
    assert line["value"] == 700.0
    assert line["vs_baseline"] == 5.243
    assert line["extra"]["mode"] == "w8a8"
    assert line["extra"]["clips_per_sec_bf16"] == 495.5
    assert "error" in line  # labeled partial, never a silent fake-complete
    # internal bookkeeping keys must not leak into the JSON
    assert not any(k.startswith("_") for k in line["extra"])


def test_watchdog_silent_after_normal_completion():
    code = """
import bench
partial = {"_metric": bench.TRAIN_METRIC, "_unit": "ms"}
bench._start_deadline_watchdog(partial, 1.0)
partial["value"] = 262.7
partial["_done"].set()   # what main()/main_train() do before printing
import time; time.sleep(2.0)
print("CLEAN-EXIT")
"""
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=25, cwd=REPO)
    assert p.returncode == 0, (p.returncode, p.stderr[-500:])
    assert p.stdout.strip() == "CLEAN-EXIT"  # no spurious partial line


def _run_tiny(code, timeout):
    env = dict(os.environ, GAVA_BENCH_TINY="1")
    p = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu')\n" + code],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)
    assert p.returncode == 0, (p.returncode, p.stderr[-800:])
    return json.loads(p.stdout.strip().splitlines()[-1])


def test_tiny_inference_bench_end_to_end():
    """GAVA_BENCH_TINY=1 runs the FULL main() the driver executes —
    every mode, gate, and latency probe — on CPU at toy shapes. A
    NameError anywhere in bench.py would otherwise surface only as a
    null driver capture on the real TPU (the BENCH_r03 lesson). ~3 min."""
    line = _run_tiny("import bench; bench.main()", timeout=780)
    assert line["value"] and line["value"] > 0
    assert line["unit"] == "clips/s"
    extra = line["extra"]
    for k in ("mode", "clips_per_sec_bf16", "clips_per_sec_w8a8",
              "clips_per_sec_w8a8_patch_major", "clips_per_sec_fused_extras",
              "clips_per_sec_fused_extras_int8_qk", "w8a8_accuracy_gate",
              "p50_latency_ms_b1", "device_latency_ms_b1_bf16"):
        assert k in extra, k
    # off-TPU the candidate flags are inert, so every w8a8-family mode must
    # produce the same probabilities as plain w8a8 (same gate delta)
    assert extra["fx_prob_delta_vs_bf16"] == extra["w8a8_prob_delta_vs_bf16"]


def test_tiny_train_bench_end_to_end():
    line = _run_tiny("import bench; bench.main_train(steps=2)", timeout=300)
    assert line["value"] and line["value"] > 0
    assert line["unit"] == "ms"
    for k in ("compile_s", "per_call_p50_ms", "target_ms", "clips_per_sec"):
        assert k in line["extra"], k


def test_compilation_cache_helper_gates(monkeypatch):
    """Disabled by env, and disabled on the CPU backend (the cache exists
    to amortize relay compiles; XLA:CPU AOT reloads log feature-mismatch
    errors and risk SIGILL, so the test suite must never hit them)."""
    from gava_clip_tpu.utils.jax_cache import enable_compilation_cache
    monkeypatch.setenv("GAVA_JAX_CACHE", "0")
    assert enable_compilation_cache() is False
    monkeypatch.delenv("GAVA_JAX_CACHE")
    # conftest pins jax_platforms=cpu for the suite
    assert enable_compilation_cache() is False
