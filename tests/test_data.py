"""Data layer: sampler parity, temporal/spatial crop parity vs reference,
video decode round trip, memory dataset semantics, loader smoke test."""

import os
import pickle
import sys
import types

import numpy as np
import pytest

from gava_clip_tpu.data.sampler import step_sampler, eval_sampler
from gava_clip_tpu.data import video as V
from gava_clip_tpu.data.datasets import (MemoryDataset, VideoDataset,
                                         VideoDatasetConfig, DummyDataset)
from gava_clip_tpu.data.loader import (LoaderConfig, create_train_loader,
                                       create_val_loader, create_memory_loader)


@pytest.fixture(scope="module")
def ref_dataset_module(reference_modules):
    """Import reference video_dataset.dataset with av/torchvision stubbed."""
    if "av" not in sys.modules:
        sys.modules["av"] = types.ModuleType("av")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__path__ = []  # mark as package
        tvt = types.ModuleType("torchvision.transforms")
        tvt.__path__ = []
        tvt.ToPILImage = tvt.ToTensor = tvt.Compose = object
        tvf = types.ModuleType("torchvision.transforms.functional")
        tv.transforms = tvt
        tvt.functional = tvf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.transforms.functional"] = tvf
    sys.path.insert(0, "/root/reference")
    import importlib
    return importlib.import_module("video_dataset.dataset")


def test_step_sampler_matches_reference_logic():
    """Reproduce dataloader.py:113-120 directly with torch and compare."""
    import torch
    n, num_steps, bs = 37, 20, 4
    sampler = []
    while len(sampler) * n < num_steps * bs:
        g = torch.Generator()
        g.manual_seed(len(sampler))
        sampler.append(torch.randperm(n, generator=g))
    want = torch.cat(sampler)[:num_steps * bs].view(num_steps, bs)
    for rank, ws, resume in [(0, 1, 0), (0, 1, 7), (1, 2, 3)]:
        per = bs // ws
        w = want[resume:, per * rank: per * (rank + 1)].numpy()
        got = step_sampler(n, num_steps, bs, rank=rank, world_size=ws,
                           resume_step=resume)
        np.testing.assert_array_equal(got, w)


def test_eval_sampler():
    np.testing.assert_array_equal(eval_sampler(10, 1, 4), [1, 5, 9])


def test_temporal_crops_match_reference(ref_dataset_module):
    import torch
    ds = ref_dataset_module.VideoDataset.__new__(ref_dataset_module.VideoDataset)
    for n_video, n_frames, rate, views in [(20, 8, 2, 3), (5, 8, 1, 1),
                                           (70, 70, 1, 1), (30, 8, 1, 10)]:
        ds.num_frames, ds.sampling_rate, ds.num_temporal_views = n_frames, rate, views
        frames = torch.arange(n_video, dtype=torch.float32).view(1, n_video, 1, 1)
        frames = frames.expand(3, n_video, 4, 4)
        want = [c[0, :, 0, 0].numpy().astype(int)
                for c in ds._generate_temporal_crops(frames)]
        got = V.temporal_crop_indices(n_video, n_frames, rate, views)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(g, w)


def test_spatial_crops_match_reference(ref_dataset_module):
    import torch
    ds = ref_dataset_module.VideoDataset.__new__(ref_dataset_module.VideoDataset)
    ds.spatial_size = 8
    for H, W, views in [(8, 14, 3), (12, 10, 1), (14, 8, 3)]:
        ds.num_spatial_views = views
        x = torch.arange(H * W, dtype=torch.float32).view(1, 1, H, W).expand(3, 2, H, W)
        want = [c.numpy() for c in ds._generate_spatial_crops(x)]
        xn = x.numpy().transpose(1, 2, 3, 0)  # (T, H, W, C)
        got = V.spatial_crops(xn, 8, views)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(g.transpose(3, 0, 1, 2), w)


def _write_video(path, n=20, h=48, w=64, seed=0):
    import cv2
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    rs = np.random.RandomState(seed)
    frames = []
    for _ in range(n):
        f = rs.randint(0, 255, (h, w, 3), dtype=np.uint8)
        frames.append(f)
        writer.write(f)
    writer.release()
    return frames


def test_decode_selected_frames(tmp_path):
    p = tmp_path / "v.mp4"
    _write_video(p)
    full = V.decode_frames(str(p))
    assert full.shape == (20, 48, 64, 3)
    sel = V.decode_frames(str(p), indices=[3, 3, 7, 19])
    np.testing.assert_array_equal(sel[0], full[3])
    np.testing.assert_array_equal(sel[1], full[3])
    np.testing.assert_array_equal(sel[2], full[7])
    np.testing.assert_array_equal(sel[3], full[19])


def test_decode_seek_matches_sequential(tmp_path):
    """Seek-based sparse decode (gaps > SEEK_MIN_GAP trigger
    CAP_PROP_POS_FRAMES) returns bitwise the same frames as a full
    sequential decode — the correctness contract of the fast path."""
    p = tmp_path / "long.mp4"
    _write_video(p, n=300)
    full = V.decode_frames(str(p), allow_seek=False)
    assert full.shape[0] == 300
    # TSN-style 8 segments over 300 frames: every gap is ~37 > SEEK_MIN_GAP
    idx = [18, 56, 93, 131, 168, 206, 243, 281]
    assert all(b - a > V.SEEK_MIN_GAP for a, b in zip(idx, idx[1:]))
    sel = V.decode_frames(str(p), indices=idx)
    np.testing.assert_array_equal(sel, full[idx])
    # repeated + clamped indices through the seek path
    sel2 = V.decode_frames(str(p), indices=[5, 5, 150, 299, 400])
    np.testing.assert_array_equal(sel2[0], full[5])
    np.testing.assert_array_equal(sel2[2], full[150])
    np.testing.assert_array_equal(sel2[3], full[299])
    np.testing.assert_array_equal(sel2[4], full[299])  # clamped past end


def test_video_dataset_end_to_end(tmp_path):
    root = tmp_path
    _write_video(root / "a.mp4")
    _write_video(root / "b.mp4", seed=1)
    with open(root / "train.csv", "w") as f:
        f.write("a.mp4,0\nb.mp4,2\n")
    ds = VideoDataset(VideoDatasetConfig(
        list_path=str(root / "train.csv"), data_root=str(root),
        num_frames=8, sampling_rate=1, spatial_size=32,
        is_train=True, add_nte=True))
    frames, label, nte = ds[1]
    assert frames.shape == (8, 32, 32, 3) and frames.dtype == np.uint8
    assert label == 2 and nte.shape == (70, 512)


def test_memory_dataset_remap(tmp_path):
    rs = np.random.RandomState(0)
    data = {"embeds": rs.randn(20, 3, 16).astype(np.float32),
            "updrs": np.array([0, 1, 2, 3, -1] * 4)}
    p = tmp_path / "mem.pkl"
    with open(p, "wb") as f:
        pickle.dump(data, f)
    ds = MemoryDataset(str(p), cls_type="updrs_3cls", for_zero_shot=False)
    assert len(ds) == 16  # -1 filtered
    assert set(np.unique(ds.labels)) == {0, 1, 2}  # 3 -> 1 remap


def test_loaders_smoke(tmp_path):
    root = tmp_path
    _write_video(root / "a.mp4")
    _write_video(root / "b.mp4", seed=1)
    with open(root / "train.csv", "w") as f:
        f.write("a.mp4,0\nb.mp4,1\n")
    cfg = LoaderConfig(train_list_path=str(root / "train.csv"),
                       val_list_path=str(root / "train.csv"),
                       data_root=str(root), batch_size=2, num_frames=4,
                       spatial_size=32, num_steps=3, num_workers=2,
                       num_temporal_views=1, mem_batch_size=4)
    tl = create_train_loader(cfg)
    batches = list(tl)
    assert len(batches) == 3
    assert batches[0]["video"].shape == (2, 4, 32, 32, 3)
    assert batches[0]["nte"].shape == (2, 70, 512)

    ml = create_memory_loader(cfg)
    mb = next(iter(ml))
    assert mb["memory"].shape == (4, 2, 512)

    vl = create_val_loader(cfg)
    vb = next(iter(vl))
    assert vb["video"].shape[0] <= 2


def test_classes_file_parsing(tmp_path):
    p = tmp_path / "cls.txt"
    with open(p, "w") as f:
        f.write("normal\nslight difficulty\nmoderate difficulty\n"
                "*normal\n*slight\n*moderate\n")
    names, labels = V.parse_classes_file(str(p))
    assert names == ["normal", "slight difficulty", "moderate difficulty"]
    assert labels == ["normal", "slight", "moderate"]
