"""Train driver with data-parallel sharding over the 8-device CPU mesh."""

import os

import numpy as np
import pytest

from tests.test_cli_train import _make_assets, _make_dataset


def test_train_driver_data_parallel(tmp_path, monkeypatch):
    import jax
    assert len(jax.devices()) == 8
    from gava_clip_tpu.cli.train import main
    _make_dataset(tmp_path)
    classes = _make_assets(tmp_path)
    monkeypatch.chdir(tmp_path)

    main([
        "--nfold", "1", "--type", "updrs",
        "--data_root", str(tmp_path),
        "--text_prompt_classes_path", str(classes),
        "--num_steps", "2", "--eval_freq", "2", "--save_freq", "100",
        "--print_freq", "1", "--batch_size", "8", "--num_frames", "2",
        "--spatial_size", "32", "--patch_size", "16",
        "--num_layers", "2", "--num_heads", "2", "--feature_dim", "32",
        "--embed_dim", "32", "--mlp_factor", "2.0",
        "--text_transformer_width", "32", "--text_transformer_heads", "2",
        "--text_transformer_layers", "2", "--text_num_prompts", "2",
        "--use_text_prompt_learning", "--use_text_prompt_CSC",
        "--use_summary_token", "--use_local_prompts", "--use_global_prompts",
        "--num_global_prompts", "2",
        "--text_prompt_init", "cntn_split_uni_disc",
        "--knowledge_version", "v1",
        "--knowledge_dir", str(tmp_path / "ke_updrs"),
        "--use_support_memory", "--memory_data_path", str(tmp_path / "mem.pkl"),
        "--mem_batch_size", "8", "--clLoss_nte_video",
        "--use_focal_ordinal_loss", "--lr", "1e-3", "--num_workers", "2",
        "--no_mirror",
    ])
    logdir = os.path.join("logs", os.listdir("logs")[0])
    assert os.path.isfile(os.path.join(logdir, "results.txt"))


def test_mesh_sharded_evaluate_matches_unsharded(tmp_path):
    """evaluate() with a data mesh must produce the identical confusion
    matrix and accuracy as the single-device path — the device-side einsum
    performs the reference's all_reduce(conf_mat) under GSPMD
    (train.py:531-534), and padding rows are masked on every shard."""
    import jax
    import jax.numpy as jnp
    from gava_clip_tpu.cli.train import evaluate
    from gava_clip_tpu.parallel.mesh import create_mesh, replicate
    from tests.test_train_step import _tiny_model

    model = _tiny_model(tmp_path, support_memory=False, add_nte=False)
    rs = np.random.RandomState(0)

    # 3 batches, the last one short (exercises the pad+valid-mask path)
    def loader():
        for n in (8, 8, 5):
            yield {"video": rs.randint(0, 255, (n, 2, 32, 32, 3), np.uint8),
                   "labels": rs.randint(0, 3, size=n).astype(np.int32)}

    mean, std = (0.45,) * 3, (0.225,) * 3
    acc0, conf0 = evaluate(model, model.params, loader(), 3, mean, std,
                           jnp.float32, batch_size=8)
    mesh = create_mesh(8)
    params = replicate(model.params, mesh)
    rs = np.random.RandomState(0)  # same data again
    acc1, conf1 = evaluate(model, params, loader(), 3, mean, std,
                           jnp.float32, batch_size=8, mesh=mesh)
    assert acc0 == acc1
    np.testing.assert_array_equal(conf0, conf1)
    assert conf0.sum() == 21


def test_shard_batch_per_host_single_process_equals_global():
    """shard_batch(per_host=True) is the multi-host production path
    (process-local slices + make_array_from_process_local_data); on a
    single process it must be exactly the global device_put path."""
    import jax
    import jax.numpy as jnp
    from gava_clip_tpu.parallel.mesh import create_mesh, shard_batch

    mesh = create_mesh(8)
    rs = np.random.RandomState(0)
    batch = {"video": rs.rand(8, 2, 4, 4, 3).astype(np.float32),
             "labels": rs.randint(0, 3, size=8)}
    glob = shard_batch(batch, mesh)
    local = shard_batch(batch, mesh, per_host=True)
    for k in batch:
        assert glob[k].sharding == local[k].sharding
        np.testing.assert_array_equal(np.asarray(glob[k]),
                                      np.asarray(local[k]))
