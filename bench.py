#!/usr/bin/env python
"""Headline benchmark: clips/sec/chip, ViT-B/16, 8-frame (BASELINE.json).

Runs the zero-shot inference path (vision tower + cosine logits — the
reference eval_scripts/k400_eval.sh workload shape) on the available chip
across the serving modes:
  * bf16 — the parity configuration;
  * w8a8 — int8 MXU serving mode (fused Pallas kernels: LayerNorm + dynamic
    per-token activation quant + int8 GEMMs + QuickGELU + residual in VMEM);
  * w8a8 + patch-major — clips ship as patch rows, the embed is one int8
    GEMM;
  * (+candidates, opt-in via GAVA_BENCH_CANDIDATES=1) fused-extras kernel
    and int8 QK^T score dots — each in its own jit closure with the
    trace-time flag held. Both measured-REJECTED on-device
    (queued_bench_r04/DECISIONS.md), hence off the default driver run.
Every non-bf16 mode is gated by an on-device accuracy check (max
softmax-prob delta vs bf16 <= 0.05, the repo-wide quantization tolerance).
The headline number is the fastest mode that passes its gate. A B=1 p50
latency probe runs in bf16.

The reference publishes no throughput numbers (BASELINE.md); `vs_baseline`
is computed against an analytic estimate of the reference PyTorch stack on
its stated RTX 6000 Ada (91 TFLOPS dense fp16) at a generous 45% MFU on the
same FLOP count — held constant across rounds so the ratio is comparable.

Measurement method: a data-dependent chain of forwards inside ONE jit with a
single scalar read at the end. The TPU here sits behind a serialized stdio
relay whose `block_until_ready` can return before execution finishes
(dispatch pipelining), so per-call host timing is unreliable; the chained
form counts pure device time and one relay round-trip.
"""

import argparse
import json
import os
import time

import numpy as np


def vit_flops_per_clip(T=8, img=224, patch=16, depth=12, width=768,
                       mlp_factor=4.0, n_global=8, n_local=8) -> float:
    """Analytic forward FLOPs for the prompt-augmented ViT-B/16 clip."""
    n_tok = (img // patch) ** 2 + 1 + n_global + n_local + 1  # patches+cls+prompts+summary
    per_layer = (4 * n_tok * width * width * 2            # qkv + out proj
                 + 2 * n_tok * n_tok * width * 2          # scores + mix
                 + 2 * n_tok * width * int(mlp_factor * width) * 2)  # mlp
    patch_embed = (img // patch) ** 2 * (patch * patch * 3) * width * 2
    summary = depth * (4 * T * width * width * 2 + 2 * T * T * width * 2)
    return T * (depth * per_layer + patch_embed) + summary


def flagship_train_flops(B=4, T=70, n_cls=3, n_kv=5) -> float:
    """Analytic FLOPs per flagship train step, 3x-forward convention
    (forward + input grads + weight grads counted as if all params train —
    the same convention is applied to the GPU estimate, so the ratio is
    insensitive to the convention). Vision tower per clip + the batched
    (n_cls*n_kv, 77) text tower the KAPT path re-encodes every step."""
    vision = B * vit_flops_per_clip(T=T)
    W, L, depth, mlp = 512, 77, 12, 4
    per_tok = 4 * W * W * 2 + 2 * L * W * 2 + 2 * W * mlp * W * 2
    text = n_cls * n_kv * L * depth * per_tok
    return 3.0 * (vision + text)


def main_train(steps: int = 20, frozen_int8: bool = False,
               remat: str = "full"):
    """Train-step bench (VERDICT r2 #3): one JSON line with ms/step at the
    flagship shape (B=4, T=70 — train_scripts/updrs_3cls_train_tulip.sh),
    TFLOP-equiv/s, and the vs-GPU analytic estimate at the same 45%-MFU
    convention as the inference bench."""
    _acquire_backend_or_die(
        float(os.environ.get("GAVA_BENCH_INIT_TIMEOUT_S", "900")),
        metric=TRAIN_METRIC, unit="ms")
    _enable_compilation_cache()
    partial = {"_metric": TRAIN_METRIC, "_unit": "ms"}
    _start_deadline_watchdog(partial, float(
        os.environ.get("GAVA_BENCH_DEADLINE_S", "1200")))
    import jax
    import jax.numpy as jnp
    from gava_clip_tpu.models.vita_clip import trainable_mask
    from gava_clip_tpu.train.state import create_train_state, make_optimizer
    from gava_clip_tpu.train.step import LossConfig, make_train_step
    from gava_clip_tpu.utils.flagship import build_flagship

    tiny = os.environ.get("GAVA_BENCH_TINY") == "1"
    B, T = (2, 2) if tiny else (4, 70)
    SIZE = 32 if tiny else 224
    model = build_flagship(num_frames=T, input_size=SIZE)
    mask = trainable_mask(model.params, model.cfg)
    opt = make_optimizer(lr=5e-6, num_steps=2000, weight_decay=0.2)
    loss_cfg = LossConfig(num_classes=3, focal_ordinal=True, fo_beta=0.2,
                          use_support_memory=True, add_nte=True)
    rs = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in {
        "video": rs.rand(B, T, SIZE, SIZE, 3).astype(np.float32),
        "labels": rs.randint(0, 3, size=B),
        "nte": rs.randn(B, 70, 512).astype(np.float32),
        "memory": rs.randn(64, 4, 512).astype(np.float32),
        "mt_labels": rs.randint(0, 3, size=64)}.items()}
    state = jax.tree_util.tree_map(jnp.asarray, create_train_state(
        model.params, mask, opt))
    jax.block_until_ready(state.trainable)
    attn = "flash" if jax.default_backend() == "tpu" else "xla"
    step = make_train_step(model, loss_cfg, opt, compute_dtype=jnp.bfloat16,
                           attn_impl=attn, remat=remat, donate=True,
                           frozen_int8=frozen_int8)
    t0 = time.time()
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total"])
    compile_s = time.time() - t0
    partial["compile_s"] = round(compile_s, 1)
    # per-call timing (block every step): includes one serialized-relay
    # round-trip (~30 ms in this environment) per step — the p50 latency a
    # synchronous caller sees
    times = []
    for _ in range(steps):
        t0 = time.time()
        state, metrics = step(state, batch)
        jax.block_until_ready(metrics["total"])
        times.append(time.time() - t0)
    med_call_ms = float(np.median(times)) * 1e3
    flops = flagship_train_flops(B=B, T=T)
    ref_ms = flops / (0.45 * 91e12) * 1e3
    # provisional headline for the deadline watchdog: per-call median
    # (includes one relay RTT per step, so slightly pessimistic — labeled
    # in per_call_note if the partial line ever ships)
    partial["value"] = round(med_call_ms, 1)
    partial["vs_baseline"] = round(ref_ms / med_call_ms, 3)
    partial["per_call_note"] = "partial: per-call p50 incl relay RTT"
    # pipelined timing (dispatch all steps async, block once): amortizes
    # the relay RTT the way the real driver does (cli/train.py only fetches
    # metrics every --print_freq steps), so this is sustained ms/step —
    # the headline
    t0 = time.time()
    for _ in range(steps):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total"])
    med_ms = (time.time() - t0) / steps * 1e3
    spread = (max(times) - min(times)) / np.median(times)
    extra = {
        "batch": B, "frames": T, "remat": remat, "donate": True,
        "frozen_int8": frozen_int8,
        "clips_per_sec": round(B / med_ms * 1e3, 2),
        "achieved_tflops_equiv": round(flops / med_ms / 1e9, 1),
        "flops_per_step_t": round(flops / 1e12, 2),
        "flops_convention": "3x forward (fwd + dx + dw), both sides",
        "ref_estimate_ms": round(ref_ms, 1),
        "compile_s": round(compile_s, 1),
        "per_call_p50_ms": round(med_call_ms, 1),
        "per_call_note": "blocking per step adds one relay RTT (~30 ms "
                         "here); headline is pipelined like the driver",
        # declared train north star (docs/PERFORMANCE.md): <=300 ms/step
        # sustained = >=2.65x the 45%-MFU GPU estimate; stretch 262.7 ms
        "target_ms": 300.0,
        "target_met": bool(med_ms <= 300.0),
        "min_ms": round(min(times) * 1e3, 1),
        "max_ms": round(max(times) * 1e3, 1),
        "device": str(jax.devices()[0]),
    }
    if spread > 1.0:
        extra["warning"] = ("high step variance — tunnel may be degraded "
                            "(CLAUDE.md); healthy-state ~263 ms")
    partial["_done"].set()
    print(json.dumps({
        "metric": TRAIN_METRIC,
        "value": round(med_ms, 1),
        "unit": "ms",
        "vs_baseline": round(ref_ms / med_ms, 3),
        "extra": extra,
    }))


INFER_METRIC = "clips/sec/chip (ViT-B/16, 8-frame, zero-shot forward)"
TRAIN_METRIC = "train ms/step (flagship ViT-B/16, B=4, T=70, full loss)"


def _enable_compilation_cache():
    """Persistent compiled-executable cache (GAVA_JAX_CACHE=0 disables) —
    a queued-bench re-arm after a window that closed mid-run then loads
    executables from disk instead of paying ~20 s of relay compile per
    mode. See gava_clip_tpu/utils/jax_cache.py."""
    from gava_clip_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()


def _start_deadline_watchdog(partial: dict, deadline_s: float):
    """Print best-so-far results and exit if the run wedges mid-measurement.

    BENCH_r03 taught that init can be healthy and the window can still
    close DURING measurement — a hang inside a jitted call is
    uninterruptible from Python, so without this the driver's `timeout`
    kills the process with NOTHING on stdout and already-measured modes
    are lost. `partial` is mutated by the bench as results land; `done`
    flips when the normal path printed its line."""
    import threading

    def watch():
        if partial.setdefault("_done", threading.Event()).wait(deadline_s):
            return
        out = {k: v for k, v in partial.items() if not k.startswith("_")}
        line = {
            "metric": partial.get("_metric", INFER_METRIC),
            "value": out.pop("value", None),
            "unit": partial.get("_unit", "clips/s"),
            "vs_baseline": out.pop("vs_baseline", None),
            "extra": out,
            "error": f"deadline {deadline_s:.0f}s hit mid-run (relay window "
                     f"closed?); partial results — modes not listed were "
                     f"never measured",
        }
        print(json.dumps(line), flush=True)
        os._exit(3)

    partial.setdefault("_done", __import__("threading").Event())
    t = __import__("threading").Thread(target=watch, daemon=True)
    t.start()
    return partial["_done"]


def _acquire_backend_or_die(timeout_s: float = 900.0,
                            metric: str = INFER_METRIC,
                            unit: str = "clips/s"):
    """Initialize the jax backend under a watchdog.

    The TPU here sits behind a serialized stdio relay with intermittent
    outage windows; during one, PJRT client creation blocks INDEFINITELY
    (observed: make_c_api_client hung >1 h), which would turn the driver's
    bench run into a silent hang. Emit a diagnostic JSON line (under the
    metric name of the bench mode that failed) and exit instead — a
    recorded outage beats a wedged round."""
    import threading

    ok = threading.Event()

    def init():
        import jax
        jax.devices()
        ok.set()

    t = threading.Thread(target=init, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok.is_set():
        print(json.dumps({
            "metric": metric,
            "value": None, "unit": unit, "vs_baseline": None,
            "error": f"TPU backend init did not complete within "
                     f"{timeout_s:.0f}s — the stdio relay is in an outage "
                     f"window (CLAUDE.md); re-run when it recovers",
        }), flush=True)
        os._exit(2)


def main():
    _acquire_backend_or_die(
        float(os.environ.get("GAVA_BENCH_INIT_TIMEOUT_S", "900")))
    _enable_compilation_cache()
    partial = {"_metric": INFER_METRIC, "_unit": "clips/s"}
    _start_deadline_watchdog(partial, float(
        os.environ.get("GAVA_BENCH_DEADLINE_S", "1200")))
    import jax
    import jax.numpy as jnp
    from gava_clip_tpu.ops.quant import quantize_tower_params
    from gava_clip_tpu.utils.flagship import (build_zero_shot,
                                              inject_clip_pathologies)

    # B=8 was optimal pre-aligned-layout; after the round-3 layout fixes
    # the w8a8 path scales further (measured: B=8 672, B=12 688, B=16 704,
    # B=24 711, B=32 709 clips/s in one window) — B=16 is the knee.
    # GAVA_BENCH_TINY=1 shrinks every shape so the FULL main() path can run
    # on the 1-core CPU in tests — the numbers are meaningless but every
    # line the driver will execute gets executed (a NameError here would
    # otherwise surface only as a null driver capture).
    tiny = os.environ.get("GAVA_BENCH_TINY") == "1"
    T, B = (2, 2) if tiny else (8, 16)
    SIZE = 32 if tiny else 224
    ITERS = 2 if tiny else 100  # long chain amortizes the ~30 ms relay RTT
    model = build_zero_shot(num_frames=T, num_classes=400, input_size=SIZE)
    # the w8a8 accuracy gate is measured on CLIP-pathology weights (LN-gain
    # activation-outlier channels + heavy-tailed weight rows — the documented
    # int8 failure modes), not a friendly N(0, 0.02) init; perf is identical
    # (value-independent) so the same params serve both measurements
    base_params = inject_clip_pathologies(model.params)
    buffers = jax.device_put(model.buffers, jax.devices()[0])
    attn_impl = "flash" if jax.default_backend() == "tpu" else "xla"
    scan_unroll = int(os.environ.get("GAVA_SCAN_UNROLL", "12"))

    def cast_bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x, tree)

    # ship weights as bf16 (halves tunnel bytes) and commit to device ONCE
    # (uncommitted numpy args re-transfer every call). Cast BEFORE
    # quantizing: the int8 scales must stay fp32 (casting a quantized tree
    # would downcast them — ~0.2%/channel multiplicative weight error on
    # top of the int8 error the gate measures)
    params_bf16 = jax.device_put(cast_bf16(base_params), jax.devices()[0])
    params_w8a8 = jax.device_put(
        quantize_tower_params(cast_bf16(base_params), act_quant=True),
        jax.devices()[0])

    def forward_fn(params, video, input_format="frames"):
        return model.apply(params, buffers, video, compute_dtype=jnp.bfloat16,
                           attn_impl=attn_impl, scan_unroll=scan_unroll,
                           input_format=input_format)["logits"]

    def make_chain(input_format):
        @jax.jit
        def chain(params, video):
            def body(i, carry):
                v, acc = carry
                s = forward_fn(params, v, input_format).astype(
                    jnp.float32).sum()
                return (v + (s * 0).astype(v.dtype), acc + s)
            return jax.lax.fori_loop(0, ITERS, body, (video, jnp.float32(0)))[1]
        return chain

    chain = make_chain("frames")
    chain_pm = make_chain("patches")
    # candidate-kernel modes (round 4): fused extras kernel and int8 QK^T
    # score dots, trace-time flags — each gets its own jit closure and the
    # flag is held during compile+measure, so the driver's bench captures
    # the best gated mode even if no builder session saw a healthy window
    chain_fx = make_chain("patches")
    chain_fx_qk = make_chain("patches")
    fwd = jax.jit(forward_fn, static_argnums=(2,))

    video = jax.jit(lambda k: jax.random.uniform(
        k, (B, T, SIZE, SIZE, 3), jnp.float32))(jax.random.PRNGKey(0))
    video1 = video[:1]
    # patch-major layout: the relayout runs once per clip OUTSIDE the hot
    # loop — in production the host ships clips patch-major (same bytes,
    # reordered; models/vision.py patchify), so the per-forward cost is a
    # contiguous GEMM with no conv relayout
    from gava_clip_tpu.models.vision import patchify
    video_pm = jax.jit(lambda v: patchify(v, (16, 16)))(video)

    def measure(params, reps=3, c=None, vid=None):
        c = c or chain
        vid = video if vid is None else vid
        float(c(params, vid))  # compile + warm
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            float(c(params, vid))
            best = max(best, B * ITERS / (time.perf_counter() - t0))
        return best

    flops = vit_flops_per_clip(T=T)
    ref_clips_per_sec = 0.45 * 91e12 / flops

    def record(key, cps, gate_ok):
        """Feed the deadline watchdog: every measured mode lands in
        `partial` immediately, and `value` tracks the best gated mode so
        a mid-run hang still yields a usable headline line."""
        partial[key] = round(cps, 1)
        if gate_ok and cps > (partial.get("value") or 0.0):
            partial["value"] = round(cps, 2)
            partial["vs_baseline"] = round(cps / ref_clips_per_sec, 3)
            partial["mode"] = key.replace("clips_per_sec_", "")

    cps_bf16 = measure(params_bf16)
    record("clips_per_sec_bf16", cps_bf16, True)
    p_ref = np.asarray(jax.nn.softmax(fwd(params_bf16, video, 'frames'), -1),
                       np.float32)

    def _set_candidate_flags(fused_extras=False, int8_qk=False):
        from gava_clip_tpu.ops.extras_kernel import set_fused_extras
        from gava_clip_tpu.ops.flash_attention import set_int8_qk
        set_fused_extras(fused_extras)
        set_int8_qk(int8_qk)

    # the candidates are measured as their OWN modes below; env-armed
    # GAVA_INT8_QK/GAVA_FUSED_EXTRAS would otherwise silently contaminate
    # the baseline w8a8/patch-major traces (and the first reset would then
    # flip them mid-run) — every number in one bench line must come from
    # the path its label names
    _set_candidate_flags()

    def gated_mode(params, c=None, vid=None, input_format="frames",
                   flags=None, fwd_fn=None):
        """(clips/s, prob delta vs bf16, gate ok) for one mode; a failure
        never loses the bench line. flags: candidate-kernel knobs held
        during trace+measure (trace-time switches; each mode gets its own
        jit closures so traces never leak across modes)."""
        try:
            if flags:
                _set_candidate_flags(**flags)
            try:
                cps = measure(params, c=c, vid=vid)
                p_q = np.asarray(jax.nn.softmax(
                    (fwd_fn or fwd)(params,
                                    vid if vid is not None else video,
                                    input_format),
                    -1), np.float32)
            finally:
                if flags:
                    _set_candidate_flags()
            delta = float(np.abs(p_ref - p_q).max())
            return cps, delta, delta <= 0.05
        except Exception as e:
            print(f"mode failed: {e!r}"[:300], file=__import__('sys').stderr)
            # delta=None (not NaN): bare NaN breaks strict JSON parsers
            return 0.0, None, False

    cps_w8a8, prob_delta, w8a8_ok = gated_mode(params_w8a8)
    record("clips_per_sec_w8a8", cps_w8a8, w8a8_ok)
    cps_pm, prob_delta_pm, pm_ok = gated_mode(
        params_w8a8, c=chain_pm, vid=video_pm, input_format="patches")
    record("clips_per_sec_w8a8_patch_major", cps_pm, pm_ok)

    # candidate kernels: both were measured and REJECTED on-device
    # (fused_extras 758.4 vs 770.5, +int8_qk 533.6 —
    # queued_bench_r04/DECISIONS.md, 2026-08-19), so their two extra
    # compile chains are now OPT-IN via GAVA_BENCH_CANDIDATES=1. Keeps the
    # default driver run two relay-compiles shorter (less exposure to a
    # degradation window mid-capture). Tiny mode still runs them so the
    # full plumbing stays CPU-smoke-tested.
    cps_fx = cps_fxqk = 0.0
    d_fx = d_fxqk = None
    fx_ok = fxqk_ok = False
    candidates_armed = (tiny or os.environ.get("GAVA_BENCH_CANDIDATES")
                        in ("1", "true"))
    if not candidates_armed:
        # not-run != measured-at-zero: emit an explicit marker so a strict
        # reader of the driver record can't misread the skip as a crash or
        # a failed accuracy gate (ADVICE r4)
        skip = "skipped (GAVA_BENCH_CANDIDATES unset; measured-rejected 2026-08-19)"
        partial["clips_per_sec_fused_extras"] = skip
        partial["clips_per_sec_fused_extras_int8_qk"] = skip
    if (jax.default_backend() == "tpu" or tiny) and candidates_armed:
        # tiny mode runs the candidate closures too (the trace-time flags
        # are inert off-TPU, so they measure the XLA path — the point is
        # executing the gated_mode/record plumbing the driver will run)
        cps_fx, d_fx, fx_ok = gated_mode(
            params_w8a8, c=chain_fx, vid=video_pm, input_format="patches",
            flags={"fused_extras": True},
            fwd_fn=jax.jit(forward_fn, static_argnums=(2,)))
        record("clips_per_sec_fused_extras", cps_fx, fx_ok)
        cps_fxqk, d_fxqk, fxqk_ok = gated_mode(
            params_w8a8, c=chain_fx_qk, vid=video_pm,
            input_format="patches",
            flags={"fused_extras": True, "int8_qk": True},
            fwd_fn=jax.jit(forward_fn, static_argnums=(2,)))
        record("clips_per_sec_fused_extras_int8_qk", cps_fxqk, fxqk_ok)

    clips_per_sec, mode = cps_bf16, "bf16"
    if w8a8_ok and cps_w8a8 > clips_per_sec:
        clips_per_sec, mode = cps_w8a8, "w8a8"
    if pm_ok and cps_pm > clips_per_sec:
        clips_per_sec, mode = cps_pm, "w8a8+patch_major"
    if fx_ok and cps_fx > clips_per_sec:
        clips_per_sec, mode = cps_fx, "w8a8+patch_major+fused_extras"
    if fxqk_ok and cps_fxqk > clips_per_sec:
        clips_per_sec, mode = cps_fxqk, "w8a8+patch_major+fused_extras+int8_qk"

    # B=1 latency probe (p50 over per-call timings; includes relay RTT)
    lat = []
    np.asarray(fwd(params_bf16, video1, 'frames'))
    for _ in range(3 if tiny else 15):
        t0 = time.perf_counter()
        np.asarray(fwd(params_bf16, video1, 'frames'))
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lat) * 1e3)

    # device-only B=1 latency: two chain lengths differenced to cancel the
    # relay round-trip (which dominates the per-call p50 above ~12x here)
    def device_latency(params):
        best = {}
        lens = (2, 6) if tiny else (30, 150)
        for iters in lens:
            @jax.jit
            def chain_n(p, v, iters=iters):
                def body(i, carry):
                    vv, acc = carry
                    s = forward_fn(p, vv).astype(jnp.float32).sum()
                    return (vv + (s * 0).astype(vv.dtype), acc + s)
                return jax.lax.fori_loop(0, iters, body,
                                         (v, jnp.float32(0)))[1]
            float(chain_n(params, video1))
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain_n(params, video1))
                b = min(b, time.perf_counter() - t0)
            best[iters] = b
        return (best[lens[1]] - best[lens[0]]) / (lens[1] - lens[0]) * 1e3

    dev_lat_ms = float(device_latency(params_bf16))
    try:
        dev_lat_w8a8_ms = round(float(device_latency(params_w8a8)), 2)
    except Exception:
        dev_lat_w8a8_ms = None

    achieved_tflops = clips_per_sec * flops / 1e12

    extra = {
        "mode": mode,
        "clips_per_sec_bf16": round(cps_bf16, 1),
        "clips_per_sec_w8a8": round(cps_w8a8, 1),
        "clips_per_sec_w8a8_patch_major": round(cps_pm, 1),
        "clips_per_sec_fused_extras": (
            round(cps_fx, 1) if candidates_armed
            else partial["clips_per_sec_fused_extras"]),
        "clips_per_sec_fused_extras_int8_qk": (
            round(cps_fxqk, 1) if candidates_armed
            else partial["clips_per_sec_fused_extras_int8_qk"]),
        "w8a8_prob_delta_vs_bf16": (None if prob_delta is None
                                    else round(prob_delta, 4)),
        "pm_prob_delta_vs_bf16": (None if prob_delta_pm is None
                                  else round(prob_delta_pm, 4)),
        "fx_prob_delta_vs_bf16": (None if d_fx is None
                                  else round(d_fx, 4)),
        "fxqk_prob_delta_vs_bf16": (None if d_fxqk is None
                                    else round(d_fxqk, 4)),
        "w8a8_accuracy_gate": "pass" if w8a8_ok else "FAIL",
        "w8a8_gate_weights": "synthetic + CLIP pathologies (LN-gain outlier "
                             "channels, heavy-tailed weight rows)",
        "p50_latency_ms_b1": round(p50_ms, 2),
        "device_latency_ms_b1_bf16": round(dev_lat_ms, 2),
        "device_latency_ms_b1_w8a8": dev_lat_w8a8_ms,
        "batch": B,
        "achieved_tflops_equiv": round(achieved_tflops, 1),
        "flops_per_clip_g": round(flops / 1e9, 1),
        "ref_estimate_clips_per_sec": round(ref_clips_per_sec, 1),
        "device": str(jax.devices()[0]),
    }
    if achieved_tflops < 10:
        # the tunneled TPU in this environment has intermittent multi-hour
        # windows where sustained execution runs ~100x slow while small
        # programs stay fast (see CLAUDE.md); flag so the number isn't read
        # as a code regression. Healthy-state measurement (2026-08-17
        # builder session): 768.8 clips/s w8a8+patch-major, 495.5 bf16.
        extra["warning"] = ("device degraded during measurement (known "
                            "tunnel issue); healthy-state: ~769 clips/s "
                            "w8a8+patch-major, ~495 bf16")
    partial["_done"].set()
    print(json.dumps({
        "metric": INFER_METRIC,
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / ref_clips_per_sec, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true",
                    help="benchmark the flagship train step instead of "
                         "zero-shot inference")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--int8_frozen", action="store_true",
                    help="with --train: int8-forward frozen backbone")
    ap.add_argument("--remat", default="save_attn_qkv",
                    choices=["none", "full", "dots", "save_attn", "save_attn_qkv",
                             "save_attn_mlp"],
                    help="with --train: rematerialization policy")
    args = ap.parse_args()
    if args.train:
        main_train(steps=args.steps, frozen_int8=args.int8_frozen,
                   remat=args.remat)
    else:
        main()
