"""Decoded-view cache (datasets.py cache_dir): identical views, no re-decode."""

import os
import os.path as osp

import numpy as np
import pytest

from gava_clip_tpu.data import video as V
from gava_clip_tpu.data.datasets import VideoDataset, VideoDatasetConfig


@pytest.fixture
def clip_dir(tmp_path):
    import cv2
    rs = np.random.RandomState(0)
    for i, label in enumerate([0, 1]):
        w = cv2.VideoWriter(str(tmp_path / f"c{i}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 40))
        for _ in range(12):
            w.write(rs.randint(0, 255, (40, 48, 3), dtype=np.uint8))
        w.release()
    (tmp_path / "list.csv").write_text("c0.mp4,0\nc1.mp4,1\n")
    return str(tmp_path)


def _cfg(clip_dir, cache_dir, **kw):
    return VideoDatasetConfig(
        list_path=osp.join(clip_dir, "list.csv"), data_root=clip_dir,
        num_frames=4, sampling_rate=1, spatial_size=32, is_train=False,
        num_spatial_views=1, num_temporal_views=2, cache_dir=cache_dir, **kw)


def test_cache_roundtrip_identical(clip_dir, tmp_path, monkeypatch):
    cache = str(tmp_path / "cache")
    ds = VideoDataset(_cfg(clip_dir, cache))
    cold = [ds[i] for i in range(len(ds))]
    assert os.listdir(cache)                      # cache populated

    calls = {"n": 0}
    real = V.decode_frames

    def counted(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(V, "decode_frames", counted)
    warm = [ds[i] for i in range(len(ds))]
    assert calls["n"] == 0                        # no re-decode
    for (fc, lc, nc), (fw, lw, nw) in zip(cold, warm):
        np.testing.assert_array_equal(fc, fw)
        assert lc == lw and nc == nw


def test_cache_key_isolates_geometry(clip_dir, tmp_path):
    cache = str(tmp_path / "cache")
    a = VideoDataset(_cfg(clip_dir, cache))[0][0]
    # different num_frames must NOT hit the 4-frame entry
    cfg2 = _cfg(clip_dir, cache)
    cfg2.num_frames = 2
    b = VideoDataset(cfg2)[0][0]
    assert a.shape[0] != b.shape[0] or a.shape != b.shape


def test_no_cache_dir_is_nop(clip_dir):
    ds = VideoDataset(_cfg(clip_dir, ""))
    f, label, name = ds[0]
    assert f.dtype == np.uint8 and label == 0 and name == "c0"


def test_train_path_uses_cache(clip_dir, tmp_path, monkeypatch):
    cache = str(tmp_path / "cache")
    cfg = _cfg(clip_dir, cache, add_nte=False)
    cfg.is_train = True
    cfg.num_temporal_views = 1
    ds = VideoDataset(cfg)
    cold, _, _ = ds[0]
    calls = {"n": 0}
    real = V.decode_frames

    def counted(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(V, "decode_frames", counted)
    warm, _, _ = ds[0]
    assert calls["n"] == 0
    np.testing.assert_array_equal(cold, warm)
