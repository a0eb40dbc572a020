"""DeCap caption decode: host-loop vs KV-cached while_loop on the device.

The host loop (models/decap.py greedy_decode, mirroring reference
decode.py:88-125) pays one host<->device round-trip per token — over this
chip's serialized stdio relay that alone is ~77 x ~30 ms ~ 2.3 s/caption —
plus a full-buffer O(L^2) transformer per step. make_greedy_decoder folds
the whole greedy loop (number interception, EOT exit) into ONE jitted
lax.while_loop with per-layer K/V caches. This tool measures both at the
real DeCap size (4L/4H/768, vocab 49908) and checks token parity.

GAVA_BENCH_TINY=1: tiny config + CPU pin, for smoke-testing the tool path.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

TINY = os.environ.get("GAVA_BENCH_TINY") == "1"
if TINY:
    jax.config.update("jax_platforms", "cpu")

from gava_clip_tpu.models.decap import (DecapConfig, greedy_decode,
                                        init_decap_params,
                                        make_batched_decoder,
                                        make_greedy_decoder)


def main():
    print("device:", jax.devices()[0])
    cfg = (DecapConfig(n_layer=2, n_head=2, n_embd=64, n_positions=32,
                       prefix_size=16) if TINY else DecapConfig())
    max_len = 12 if TINY else 77
    reps = 2 if TINY else 5
    params = jax.device_put(init_decap_params(jax.random.PRNGKey(0), cfg),
                            jax.devices()[0])
    rs = np.random.RandomState(1)
    feats = [rs.randn(cfg.prefix_size).astype(np.float32)
             for _ in range(reps)]

    dec = make_greedy_decoder(params, cfg, max_len=max_len)
    t0 = time.perf_counter()
    cached = [dec(f) for f in feats]
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    cached = [dec(f) for f in feats]
    t_cached = (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    host = [greedy_decode(params, f, cfg, max_len=max_len) for f in feats]
    warm_h = time.perf_counter() - t0
    t0 = time.perf_counter()
    host = [greedy_decode(params, f, cfg, max_len=max_len) for f in feats]
    t_host = (time.perf_counter() - t0) / reps

    n_tok = sum(len(t) for t, _ in host) / reps
    print(f"parity: {'OK' if cached == host else 'MISMATCH'} "
          f"({n_tok:.0f} tokens/caption avg)")
    print(f"host-loop: first {warm_h:.2f}s, steady {t_host*1e3:.1f} ms/caption")
    print(f"cached:    first {warm:.2f}s, steady {t_cached*1e3:.1f} ms/caption")
    print(f"decode speedup: {t_host/t_cached:.1f}x "
          f"({1e3/ (t_cached*1e3):.1f} captions/s cached)")

    bdec = make_batched_decoder(params, cfg, max_len=max_len, batch=reps)
    feats_arr = np.stack(feats)
    batched = bdec(feats_arr)  # compile
    t0 = time.perf_counter()
    batched = bdec(feats_arr)
    t_b = (time.perf_counter() - t0) / reps
    print(f"batched(B={reps}): {t_b*1e3:.1f} ms/caption "
          f"({1e3/(t_b*1e3):.1f} captions/s) parity "
          f"{'OK' if batched == host else 'MISMATCH'}")
    if cached != host or batched != host:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
