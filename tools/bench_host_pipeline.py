#!/usr/bin/env python
"""Host data-path benchmark: decode + resize + crop throughput (clips/s).

The device consumes ~363 8-frame clips/s (v5e, bf16); this measures whether
the host path keeps up and how much the native framepipe buys over cv2.
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_video(path, n=64, h=256, w=340):
    import cv2
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    rs = np.random.RandomState(0)
    for _ in range(n):
        writer.write(rs.randint(0, 255, (h, w, 3), dtype=np.uint8))
    writer.release()


def main():
    from gava_clip_tpu.data import native
    from gava_clip_tpu.data import video as V

    tmp = tempfile.mkdtemp(prefix="hostbench_")
    path = os.path.join(tmp, "v.mp4")
    make_video(path)
    T = 8

    # decode-only (seek-sampled 8 frames out of 64)
    idx = list(range(0, 64, 8))
    t0 = time.perf_counter()
    n_iter = 20
    for _ in range(n_iter):
        frames = V.decode_frames(path, indices=idx)
    dt_decode = (time.perf_counter() - t0) / n_iter

    # resize+crop via cv2 vs native
    results = {"decode_ms": dt_decode * 1e3}
    for use_native in (False, True):
        if use_native and not native.available():
            continue
        t0 = time.perf_counter()
        for _ in range(n_iter):
            r = V.keep_aspect_resize(frames, 224, use_native=use_native)
            c = V.center_crop(r, 224)
        dt = (time.perf_counter() - t0) / n_iter
        results["native_resize_ms" if use_native else "cv2_resize_ms"] = dt * 1e3

    total = dt_decode + results.get("native_resize_ms",
                                    results["cv2_resize_ms"]) / 1e3
    results["clips_per_sec_single_thread"] = 1.0 / total
    for k, v in results.items():
        print(f"{k}: {v:.2f}")
    print(f"(x num_workers threads; cv2+native release the GIL)")

    # TSN eval access pattern (VERDICT r1 #7): 8 TSN frames from a
    # 300-frame clip — decode-all (reference semantics) vs sequential
    # read-to-last vs seek-based sparse decode.
    long_path = os.path.join(tmp, "long.mp4")
    make_video(long_path, n=300)
    tsn_idx = [int((i + 0.5) * 300 / T) for i in range(T)]
    n_iter = 10
    variants = {
        "tsn300_decode_all_ms": lambda: V.decode_frames(long_path),
        "tsn300_sequential_ms": lambda: V.decode_frames(
            long_path, indices=tsn_idx, allow_seek=False),
        "tsn300_seek_ms": lambda: V.decode_frames(long_path, indices=tsn_idx),
    }
    for name, fn in variants.items():
        fn()  # warm the page cache
        t0 = time.perf_counter()
        for _ in range(n_iter):
            fn()
        print(f"{name}: {(time.perf_counter() - t0) / n_iter * 1e3:.2f}")


if __name__ == "__main__":
    main()
