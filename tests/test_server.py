"""HTTP serving front-end: endpoints + cross-request micro-batching."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from gava_clip_tpu.server import MicroBatcher, serve

T, S, NCLS = 2, 16, 3


class FakeClassifier:
    """Stands in for serve.VideoClassifier: deterministic probs keyed by the
    clip's first byte; records forward batch sizes."""

    classnames = ["a", "b", "c"]
    num_frames = T
    spatial_size = S
    batch_size = 4

    def __init__(self):
        self.calls = []

    def classify_clips(self, clips_u8):
        self.calls.append(clips_u8.shape[0])
        lead = clips_u8.reshape(clips_u8.shape[0], -1)[:, 0].astype(np.int64)
        probs = np.zeros((clips_u8.shape[0], NCLS), np.float32)
        probs[np.arange(len(lead)), lead % NCLS] = 1.0
        return probs

    def prepare_video(self, path):
        import cv2
        cap = cv2.VideoCapture(path)
        frames = []
        while True:
            ok, fr = cap.read()
            if not ok:
                break
            frames.append(cv2.resize(fr, (S, S)))
        cap.release()
        return np.stack(frames[:T]).astype(np.uint8)


@pytest.fixture()
def server():
    clf = FakeClassifier()
    httpd = serve(clf, host="127.0.0.1", port=0, max_wait_ms=30.0)
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, clf
    httpd.shutdown()
    httpd.batcher.stop()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def _get(url):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def _clip_bytes(lead):
    clip = np.full((T, S, S, 3), lead, np.uint8)
    buf = io.BytesIO()
    np.save(buf, clip)
    return buf.getvalue()


def test_health_and_model(server):
    base, _ = server
    assert _get(base + "/healthz") == {"status": "ok"}
    meta = _get(base + "/v1/model")
    assert meta["classes"] == ["a", "b", "c"]
    assert meta["num_frames"] == T


def test_classify_clip(server):
    base, _ = server
    out = _post(base + "/v1/classify_clip", _clip_bytes(4))
    assert out["label"] == "b"          # 4 % 3 == 1
    assert len(out["probs"]) == NCLS


def test_bad_clip_shape(server):
    base, _ = server
    buf = io.BytesIO()
    np.save(buf, np.zeros((1, 2, 3), np.uint8))
    req = urllib.request.Request(base + "/v1/classify_clip",
                                 data=buf.getvalue(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_classify_clip_raw(server):
    """Raw-bytes fast path: the body IS the C-order uint8 pixel buffer —
    same result as the .npy endpoint without the header/parse copy."""
    base, _ = server
    clip = np.full((T, S, S, 3), 4, np.uint8)
    out = _post(base + "/v1/classify_clip_raw", clip.tobytes())
    assert out["label"] == "b"          # 4 % 3 == 1
    assert len(out["probs"]) == NCLS


def test_classify_clip_raw_bad_length(server):
    base, _ = server
    req = urllib.request.Request(base + "/v1/classify_clip_raw",
                                 data=b"\x00" * 17, method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    body = json.loads(e.value.read())
    assert "bytes" in body["error"]


def test_stats_endpoint_decomposes_host_path(server):
    """/v1/stats must expose the batcher occupancy counters and the
    handler phase accumulators (read/parse/respond) that decompose the
    serving host path (VERDICT r4 #5)."""
    base, _ = server
    _post(base + "/v1/classify_clip", _clip_bytes(1))
    _post(base + "/v1/classify_clip_raw",
          np.full((T, S, S, 3), 2, np.uint8).tobytes())
    stats = _get(base + "/v1/stats")
    assert stats["posts"] == 2
    assert stats["requests"] >= 2 and stats["batches"] >= 1
    for k in ("read_s", "parse_s", "respond_s", "stack_s", "infer_s"):
        assert k in stats and stats[k] >= 0.0


def test_classify_video(server, tmp_path):
    import cv2
    base, _ = server
    p = tmp_path / "v.mp4"
    w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"), 10, (S, S))
    for _ in range(4):
        w.write(np.full((S, S, 3), 5, np.uint8))
    w.release()
    out = _post(base + "/v1/classify_video", p.read_bytes())
    assert out["label"] in ("a", "b", "c")


def test_micro_batching_coalesces(server):
    """Concurrent requests land in one fixed-batch forward."""
    base, clf = server
    results = [None] * 4

    def hit(i):
        results[i] = _post(base + "/v1/classify_clip", _clip_bytes(i))

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, r in enumerate(results):
        assert r["label"] == "abc"[i % NCLS]
    # at least one forward carried >1 request (30 ms window, 4 rushers)
    assert max(clf.calls) > 1


def test_batcher_direct():
    clf = FakeClassifier()
    b = MicroBatcher(clf, max_wait_ms=5.0)
    probs = b.classify(np.full((T, S, S, 3), 7, np.uint8))
    assert probs.argmax() == 7 % NCLS
    b.stop()
