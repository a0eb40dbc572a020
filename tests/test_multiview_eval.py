"""Multi-view evaluation (beyond parity): all spatial x temporal views are
returned and probabilities averaged."""

import numpy as np
import pytest

from gava_clip_tpu.data.datasets import VideoDataset, VideoDatasetConfig
from gava_clip_tpu.data.loader import LoaderConfig, create_val_loader


def _write_video(path, n=40, h=36, w=60):
    import cv2
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    rs = np.random.RandomState(0)
    for _ in range(n):
        writer.write(rs.randint(0, 255, (h, w, 3), dtype=np.uint8))
    writer.release()


def test_all_views_dataset(tmp_path):
    _write_video(tmp_path / "a.mp4")
    with open(tmp_path / "val.csv", "w") as f:
        f.write("a.mp4,1\n")
    ds = VideoDataset(VideoDatasetConfig(
        list_path=str(tmp_path / "val.csv"), data_root=str(tmp_path),
        num_spatial_views=3, num_temporal_views=2, num_frames=4,
        sampling_rate=1, spatial_size=32, is_train=False,
        return_all_views=True))
    views, label, name = ds[0]
    assert views.shape == (6, 4, 32, 32, 3)   # 3 spatial x 2 temporal
    assert label == 1 and name == "a"


def test_multiview_evaluate(tmp_path):
    from gava_clip_tpu.cli.train import evaluate
    from tests.test_train_step import _tiny_model
    _write_video(tmp_path / "a.mp4", h=36, w=36)
    _write_video(tmp_path / "b.mp4", h=36, w=36)
    with open(tmp_path / "val.csv", "w") as f:
        f.write("a.mp4,0\nb.mp4,2\n")
    model = _tiny_model(tmp_path, support_memory=False, add_nte=False)
    lcfg = LoaderConfig(val_list_path=str(tmp_path / "val.csv"),
                        data_root=str(tmp_path), batch_size=2, num_frames=2,
                        spatial_size=32, num_spatial_views=1,
                        num_temporal_views=3, num_workers=1,
                        eval_all_views=True)
    loader = create_val_loader(lcfg)
    import jax.numpy as jnp
    acc, conf = evaluate(model, model.params, loader, 3,
                         (0.45,) * 3, (0.225,) * 3, jnp.float32, 2)
    assert conf.sum() == 2
    assert 0 <= acc <= 100
