"""REAL multi-host execution test (VERDICT r4 #3).

The multi-host data path — per-rank loader slicing (the reference
DistributedSampler role, video_dataset/dataloader.py:113-120) +
shard_batch(per_host=True) (make_array_from_process_local_data) + jitted
train steps over the global mesh — previously had only mocked coverage
(tests/test_distributed.py fake_cluster).  This test launches TWO separate
OS processes that form an actual jax.distributed cluster on localhost
(CPU backend, 1 device per process), runs two production train steps, and
asserts the losses match a single-process baseline run over an identical
2-device mesh (same mesh shape -> same compiled reduction order -> the
losses must agree to float32 jit-vs-jit tolerance).

Worker: tests/multihost_worker.py (not a pytest module).
Skip policy: a rendezvous timeout under CPU contention skips (the 1-core
box can starve the coordinator); any worker error FAILS.
"""

import json
import os
import os.path as osp
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = osp.dirname(osp.abspath(__file__))
WORKER = osp.join(HERE, "multihost_worker.py")
TIMEOUT_S = 420


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _make_dataset(root):
    """Tiny TULIP-format dataset matching the worker's LoaderConfig
    (32px, 2 frames, embed_dim=32, nte on, memory pkl)."""
    import cv2
    rs = np.random.RandomState(0)
    nte_dir = osp.join(root, "nte")
    os.makedirs(nte_dir, exist_ok=True)
    lines = []
    for i, label in enumerate([0, 1, 2, 0, 1, 2]):
        name = f"clip{i}"
        w = cv2.VideoWriter(osp.join(root, name + ".mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 32))
        for _ in range(4):
            w.write(rs.randint(0, 255, (32, 32, 3), dtype=np.uint8))
        w.release()
        np.save(osp.join(nte_dir, name + ".npy"),
                rs.randn(70, 32).astype(np.float32))
        lines.append(f"{name}.mp4,{label}")
    with open(osp.join(root, "train_updrs.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")
    mem_pkl = osp.join(root, "mem.pkl")
    with open(mem_pkl, "wb") as f:
        pickle.dump({"embeds": rs.randn(12, 3, 32).astype(np.float32),
                     "updrs": np.array([0, 1, 2] * 4)}, f)
    return mem_pkl


def _env(n_local_devices: int):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{n_local_devices}")
    # worker pins jax_platforms=cpu itself; drop pytest-specific leftovers
    env.pop("PYTEST_CURRENT_TEST", None)
    return env


def _launch(rank, world, coord, data_root, mem_pkl, out, n_local):
    return subprocess.Popen(
        [sys.executable, WORKER, "--rank", str(rank), "--world", str(world),
         "--coord", coord, "--data-root", data_root, "--mem-pkl", mem_pkl,
         "--out", out, "--steps", "2"],
        env=_env(n_local), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)


def _wait(proc, what):
    try:
        out, _ = proc.communicate(timeout=TIMEOUT_S)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.communicate()
        pytest.skip(f"{what} timed out after {TIMEOUT_S}s "
                    "(rendezvous starvation under 1-core contention)")
    assert proc.returncode == 0, f"{what} failed:\n{out[-4000:]}"
    return out


def test_two_process_cluster_matches_single_process(tmp_path):
    data_root = str(tmp_path)
    mem_pkl = _make_dataset(data_root)

    # baseline: ONE process over a 2-device local mesh (same mesh shape as
    # the cluster run, so the compiled computation is identical)
    base_out = str(tmp_path / "base.json")
    _wait(_launch(0, 1, "", data_root, mem_pkl, base_out, n_local=2),
          "single-process baseline")
    base = json.load(open(base_out))
    assert base["process_count"] == 1 and base["global_devices"] == 2

    # the real thing: two OS processes, jax.distributed on localhost,
    # one CPU device each -> global mesh data=2
    coord = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"rank{r}.json") for r in (0, 1)]
    procs = [_launch(r, 2, coord, data_root, mem_pkl, outs[r], n_local=1)
             for r in (0, 1)]
    logs = [_wait(p, f"cluster rank{r}") for r, p in enumerate(procs)]

    recs = [json.load(open(o)) for o in outs]
    for r, rec in enumerate(recs):
        assert rec["process_count"] == 2, logs[r][-2000:]
        assert rec["global_devices"] == 2
        assert rec["local_devices"] == 1
        assert rec["mesh"] == {"data": 2}
        assert rec["rank"] == r
    # every process computes the same replicated loss
    assert recs[0]["losses"] == pytest.approx(recs[1]["losses"], rel=1e-6)
    # and the cluster run reproduces the single-process run
    assert recs[0]["losses"] == pytest.approx(base["losses"],
                                              rel=2e-4, abs=1e-5), \
        (recs[0]["losses"], base["losses"])
