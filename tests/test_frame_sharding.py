"""Sequence (frame-axis) parallelism: the vision tower's (B, T) layout lets
GSPMD shard the frame axis across devices — per-frame spatial attention is
embarrassingly parallel; only the tiny cross-frame summary attention and the
final temporal mean induce collectives (SURVEY.md §2.6 'beyond parity')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gava_clip_tpu.parallel.mesh import create_mesh
from tests.test_train_step import _tiny_model


def test_frame_sharded_forward_matches_replicated(tmp_path):
    assert len(jax.devices()) == 8
    # T=8 so the frame axis splits evenly over the 8-device mesh
    from gava_clip_tpu.models.prompts import PromptConfig
    from gava_clip_tpu.models.text import TextConfig
    from gava_clip_tpu.models.vision import VisionConfig
    from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig
    tf = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    cfg = VitaClipConfig(
        vision=VisionConfig(input_size=(32, 32), num_frames=8, feature_dim=32,
                            patch_size=(16, 16), heads=2, layers=2,
                            mlp_factor=2.0, embed_dim=16,
                            use_summary_token=True, use_local_prompts=True,
                            use_global_prompts=True, num_global_prompts=2),
        num_classes=3, zeroshot_evaluation=True)
    model = VitaClip(cfg, zeroshot_text_features=tf)

    rs = np.random.RandomState(1)
    video = rs.rand(2, 8, 32, 32, 3).astype(np.float32)

    @jax.jit
    def forward(params, v):
        return model.apply(params, model.buffers, v)["logits"]

    want = np.asarray(forward(model.params, jnp.asarray(video)))

    mesh = create_mesh(axis_names=("frame",))
    v_sharded = jax.device_put(video, NamedSharding(mesh, P(None, "frame")))
    params_rep = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), model.params)
    got = np.asarray(forward(params_rep, v_sharded))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
