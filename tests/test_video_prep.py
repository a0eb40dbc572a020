"""Offline video preparation: chunking, LOSO, 3-class conversion, resize,
turning-point segmentation."""

import csv
import os
import os.path as osp

import numpy as np
import pytest

from gava_clip_tpu.offline.video_prep import (annotations_to_csv,
                                              build_loso_folds,
                                              chunk_start_indices,
                                              convert_3cls_csv,
                                              crop_frame_with_bbox,
                                              crop_videos_with_bbox,
                                              cut_straight_segments,
                                              find_turning_points,
                                              gold_standard_to_label,
                                              load_label_table,
                                              resize_videos,
                                              split_videos_into_chunks)


def _write_video(path, n, h=32, w=40):
    import cv2
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    rs = np.random.RandomState(abs(hash(str(path))) % 2**31)
    for _ in range(n):
        writer.write(rs.randint(0, 255, (h, w, 3), dtype=np.uint8))
    writer.release()


def test_chunk_start_indices():
    # train: stride grid + tail chunk (reference semantics)
    idx = chunk_start_indices(200, seqlen=70, is_train=True)
    assert (idx >= 0).all()
    assert all(199 - i >= 69 for i in idx)
    # val: non-overlapping
    idx = chunk_start_indices(200, seqlen=70, is_train=False)
    assert list(idx) == [0, 70]
    # exactly one chunk
    idx = chunk_start_indices(70, seqlen=70, is_train=False)
    assert list(idx) == [0]


def test_split_videos_into_chunks(tmp_path):
    vids = tmp_path / "vids"
    vids.mkdir()
    _write_video(vids / "Subject_1_walk.mp4", 150)
    _write_video(vids / "Subject_2_walk.mp4", 80)
    labels = {"Subject_1_walk": (0, 1), "Subject_2_walk": (1, 2)}
    out = tmp_path / "chunks_0"
    split = split_videos_into_chunks(str(vids), labels, str(out), seqlen=70,
                                     val_subs=["Subject_1"])
    assert split["val"] == ["Subject_1_walk"]
    files = set(os.listdir(out))
    assert {"train_diag.csv", "train_updrs.csv", "val_diag.csv",
            "val_updrs.csv"} <= files
    with open(out / "val_updrs.csv") as f:
        rows = list(csv.reader(f))
    assert rows and all(r[1] == "1" for r in rows)
    assert all("*" in r[0] for r in rows)
    # chunk files decodable with the right length
    from gava_clip_tpu.data.video import decode_frames
    chunk = decode_frames(str(out / rows[0][0]))
    assert chunk.shape[0] == 70


def test_build_loso_folds(tmp_path):
    vids = tmp_path / "vids"
    vids.mkdir()
    labels = {}
    for s in (1, 2):
        name = f"Subject_{s}_walk"
        _write_video(vids / f"{name}.mp4", 90)
        labels[name] = (s % 2, s % 3)
    split = build_loso_folds(str(vids), labels, str(tmp_path / "tulip"), nfold=2)
    assert set(split.keys()) == {0, 1}
    assert osp.isdir(tmp_path / "tulip" / "chunks_0")
    assert osp.isdir(tmp_path / "tulip" / "chunks_1")
    # each subject is val exactly once
    vals = [split[n]["val"][0] for n in (0, 1)]
    assert set(vals) == {"Subject_1_walk", "Subject_2_walk"}


def test_convert_3cls_csv(tmp_path):
    diag = tmp_path / "d.csv"
    score = tmp_path / "s.csv"
    with open(diag, "w", newline="") as f:
        csv.writer(f).writerows([["a", 0], ["b", 1], ["c", 3], ["d", 4]])
    with open(score, "w", newline="") as f:
        csv.writer(f).writerows([["a", 0], ["b", 2], ["c", 3]])
    convert_3cls_csv(str(diag), str(score))
    with open(tmp_path / "d_3cls.csv") as f:
        got = {r[0]: int(r[1]) for r in csv.reader(f)}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}
    with open(tmp_path / "s_3cls.csv") as f:
        got = {r[0]: int(r[1]) for r in csv.reader(f)}
    assert got == {"a": 0, "b": 2, "c": 2}


def test_resize_videos(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_video(src / "big.mp4", 5, h=64, w=128)
    outs = resize_videos(str(src), str(tmp_path / "dst"), short_side=32)
    from gava_clip_tpu.data.video import decode_frames
    frames = decode_frames(outs[0])
    assert min(frames.shape[1:3]) == 32


def test_turning_points_and_segments(tmp_path):
    # back-and-forth trajectory: right, turn, left
    t = np.arange(300)
    x = np.concatenate([np.linspace(0, 10, 150), np.linspace(10, 0, 150)])
    pts = find_turning_points(x, fps=30)
    assert len(pts) >= 1
    assert any(120 < p < 180 for p in pts)

    vid = tmp_path / "Subject_3_walk.mp4"
    _write_video(vid, 300)
    outs = cut_straight_segments(str(vid), x, str(tmp_path / "subseq"))
    assert len(outs) >= 2
    assert all("_CC" in o for o in outs)


def test_annotations_to_csv(tmp_path):
    for c in ("walking", "running"):
        (tmp_path / c).mkdir()
        _write_video(tmp_path / c / "v0.mp4", 3)
    rows = annotations_to_csv(str(tmp_path), str(tmp_path / "list.csv"))
    assert len(rows) == 2
    assert rows[0][0].startswith("running") and rows[0][1] == 0


def test_load_label_table_csv(tmp_path):
    p = tmp_path / "labels.csv"
    with open(p, "w", newline="") as f:
        csv.writer(f).writerows([["vidname", "diag", "score"],
                                 ["Subject_1_walk", 1, 2]])
    t = load_label_table(str(p))
    assert t == {"Subject_1_walk": (1, 2)}


def test_class_distribution(tmp_path):
    from gava_clip_tpu.offline.video_prep import class_distribution
    for n in (0, 1):
        d = tmp_path / f"chunks_{n}"
        d.mkdir()
        for split in ("train", "val"):
            with open(d / f"{split}_updrs.csv", "w", newline="") as f:
                csv.writer(f).writerows([["a.mp4", 0], ["b.mp4", 1]])
            with open(d / f"{split}_diag.csv", "w", newline="") as f:
                csv.writer(f).writerows([["a.mp4", 1], ["b.mp4", 1]])
    dist = class_distribution(str(tmp_path))
    assert dist["nfold"] == 2
    assert dist["updrs"] == {0: 2.0, 1: 2.0}
    assert dist["diag"] == {1: 4.0}


def test_crop_frame_with_bbox_golden():
    """Replicates the reference's inner crop math (train_utils.py:530-563):
    clamp, zero-pad to square bottom/right, resize 256^2."""
    import cv2
    rs = np.random.RandomState(0)
    frame = rs.randint(0, 255, (100, 120, 3), dtype=np.uint8)
    for c_x, c_y, bs in [(60.0, 50.0, 0.3), (5.0, 5.0, 0.4), (115.0, 95.0, 0.5)]:
        # reference math, transcribed
        bsize = int(bs * 224 / 2)
        x1, y1 = int(c_x) - bsize, int(c_y) - bsize
        x2, y2 = int(c_x) + bsize, int(c_y) + bsize
        x1, y1 = max(x1, 0), max(y1, 0)
        y2, x2 = min(y2, frame.shape[0]), min(x2, frame.shape[1])
        crop = frame[y1:y2, x1:x2]
        w, h = x2 - x1, y2 - y1
        if w > h:
            crop = np.concatenate((crop, np.zeros((w - h, w, 3), np.uint8)), 0)
        elif h > w:
            crop = np.concatenate((crop, np.zeros((h, h - w, 3), np.uint8)), 1)
        want = cv2.resize(crop, (256, 256))
        got = crop_frame_with_bbox(frame, c_x, c_y, bs)
        np.testing.assert_array_equal(got, want)


def test_crop_videos_with_bbox(tmp_path):
    import pickle
    vids = tmp_path / "vids"
    vids.mkdir()
    _write_video(vids / "Subject_1_Camera1.mp4", n=10, h=64, w=80)
    bbox = {"Subject_1_Camera1_CC0": {
        "bbox": np.array([[40.0, 30.0, 0.2]] * 4),
        "frame_ids": np.array([0, 2, 4, 6])}}
    with open(tmp_path / "bbox.pkl", "wb") as f:
        pickle.dump(bbox, f)
    outs = crop_videos_with_bbox(str(vids), str(tmp_path / "bbox.pkl"),
                                 str(tmp_path / "out"), out_size=64)
    assert len(outs) == 1 and osp.isfile(outs[0])
    from gava_clip_tpu.data.video import decode_frames
    frames = decode_frames(outs[0])
    assert frames.shape == (4, 64, 64, 3)


def test_gold_standard_to_label(tmp_path):
    import pandas as pd
    vids = tmp_path / "vids"
    vids.mkdir()
    for name in ("Subject_2_Camera1.mp4", "Subject_1_Camera1.mp4",
                 "Subject_1_Camera2.mp4"):
        (vids / name).touch()
    with open(tmp_path / "gait_label.csv", "w", newline="") as f:
        csv.writer(f).writerows([
            ["Subject", "gold_standard", "diag"],
            [1, 2, "HT"], [2, 1, "PD"]])
    out = gold_standard_to_label(str(tmp_path / "gait_label.csv"), str(vids),
                                 str(tmp_path / "labels.xlsx"))
    table = load_label_table(out)
    # sorted by int(subject + camera): 11, 12, 21
    assert table == {"Subject_1_Camera1": (0, 2),
                     "Subject_1_Camera2": (0, 2),
                     "Subject_2_Camera1": (1, 1)}
