"""Serving classifier: fixed-batch padding, video path end-to-end."""

import numpy as np
import pytest

from gava_clip_tpu.serve import VideoClassifier
from gava_clip_tpu.utils.flagship import build_zero_shot


@pytest.fixture(scope="module")
def tiny_classifier():
    from gava_clip_tpu.models.text import TextConfig
    from gava_clip_tpu.models.vision import VisionConfig
    from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig
    tf = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    cfg = VitaClipConfig(
        vision=VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                            patch_size=(16, 16), heads=2, layers=2,
                            mlp_factor=2.0, embed_dim=16,
                            use_summary_token=True, use_local_prompts=True,
                            use_global_prompts=True, num_global_prompts=2),
        num_classes=3, zeroshot_evaluation=True)
    model = VitaClip(cfg, zeroshot_text_features=tf)
    return VideoClassifier.from_model(
        model, ["normal", "slight", "moderate"], batch_size=4).warmup()


def test_classify_clips_padding(tiny_classifier):
    rs = np.random.RandomState(1)
    clips = rs.randint(0, 255, (6, 2, 32, 32, 3), np.uint8)
    probs = tiny_classifier.classify_clips(clips)
    assert probs.shape == (6, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)
    # padding must not change results vs exact-batch evaluation
    probs2 = tiny_classifier.classify_clips(clips[:4])
    np.testing.assert_allclose(probs[:4], probs2, atol=1e-5)


def test_bucket_selection(tiny_classifier):
    """Padding buckets are powers of two capped at the serving batch; a
    request of k clips transfers the smallest bucket >= k (H2D bytes
    dominate partial-batch cost through the relay — serve.py docstring)."""
    assert tiny_classifier._buckets() == [1, 2, 4]
    assert [tiny_classifier._bucket(k) for k in (1, 2, 3, 4)] == [1, 2, 4, 4]
    clf = VideoClassifier(tiny_classifier.model, tiny_classifier.model.params,
                          tiny_classifier.classnames, batch_size=6)
    assert clf._buckets() == [1, 2, 4, 6]
    assert clf._bucket(5) == 6
    clf_nb = VideoClassifier(tiny_classifier.model,
                             tiny_classifier.model.params,
                             tiny_classifier.classnames, batch_size=4,
                             pad_buckets=False)
    assert clf_nb._buckets() == [4]
    assert clf_nb._bucket(1) == 4


def test_bucketed_matches_unbucketed(tiny_classifier):
    """Bucketed padding must not change probabilities vs padding every
    partial batch to the full serving batch."""
    clf_nb = VideoClassifier(tiny_classifier.model, tiny_classifier.model.params,
                             tiny_classifier.classnames, batch_size=4,
                             pad_buckets=False)
    rs = np.random.RandomState(7)
    for n in (1, 3, 5):
        clips = rs.randint(0, 255, (n, 2, 32, 32, 3), np.uint8)
        np.testing.assert_allclose(tiny_classifier.classify_clips(clips),
                                   clf_nb.classify_clips(clips), atol=1e-5)


def test_buckets_disabled_under_mesh(tiny_classifier):
    """Bucket sizes would have to divide the data axis — serving under a
    mesh pads to the full batch instead."""
    from gava_clip_tpu.parallel.mesh import create_mesh
    mesh = create_mesh(n_devices=4)
    clf = VideoClassifier(tiny_classifier.model, tiny_classifier.model.params,
                          tiny_classifier.classnames, batch_size=4, mesh=mesh)
    assert clf.pad_buckets is False
    assert clf._buckets() == [4]


def test_classify_video(tiny_classifier, tmp_path):
    import cv2
    p = tmp_path / "v.mp4"
    w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 40))
    rs = np.random.RandomState(2)
    for _ in range(10):
        w.write(rs.randint(0, 255, (40, 48, 3), np.uint8))
    w.release()
    label, probs = tiny_classifier.classify_video(str(p))
    assert label in ("normal", "slight", "moderate")
    assert probs.shape == (3,)


def test_sharded_serving_matches_single_device(tiny_classifier):
    """DP serving over a 'data' mesh (shard_map, weights replicated) must
    reproduce the single-device classifier bit-for-bit-ish: the per-shard
    forward is the same program on a batch slice, with no collectives."""
    from gava_clip_tpu.parallel.mesh import create_mesh
    mesh = create_mesh(n_devices=4)
    clf = VideoClassifier(tiny_classifier.model, tiny_classifier.model.params,
                          tiny_classifier.classnames, batch_size=4, mesh=mesh)
    rs = np.random.RandomState(3)
    clips = rs.randint(0, 255, (6, 2, 32, 32, 3), np.uint8)
    probs_sharded = clf.classify_clips(clips)
    probs_single = tiny_classifier.classify_clips(clips)
    np.testing.assert_allclose(probs_sharded, probs_single, atol=1e-5)


def test_sharded_serving_batch_divisibility():
    from gava_clip_tpu.parallel.mesh import create_mesh
    from gava_clip_tpu.models.vision import VisionConfig
    from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig
    mesh = create_mesh(n_devices=4)
    tf = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    cfg = VitaClipConfig(
        vision=VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                            patch_size=(16, 16), heads=2, layers=1,
                            mlp_factor=2.0, embed_dim=16),
        num_classes=3, zeroshot_evaluation=True)
    model = VitaClip(cfg, zeroshot_text_features=tf)
    with pytest.raises(ValueError, match="divisible"):
        VideoClassifier.from_model(model, ["a", "b", "c"], batch_size=6,
                                   mesh=mesh)


def test_patch_major_classifier_matches_frames():
    """patch_major=True (uint8 patch rows + normalization folded into the
    patch-embed weights) must agree with the standard frames classifier —
    the fold is an exact affine identity, so only fp rounding differs."""
    import jax.numpy as jnp
    from gava_clip_tpu.models.vision import VisionConfig
    from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig
    from gava_clip_tpu.serve import VideoClassifier
    tf = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    cfg = VitaClipConfig(
        vision=VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                            patch_size=(16, 16), heads=2, layers=2,
                            mlp_factor=2.0, embed_dim=16,
                            use_summary_token=True, use_local_prompts=True,
                            use_global_prompts=True, num_global_prompts=2),
        num_classes=3, zeroshot_evaluation=True)
    model = VitaClip(cfg, zeroshot_text_features=tf)
    names = ["a", "b", "c"]
    clf = VideoClassifier.from_model(model, names, batch_size=2,
                                     compute_dtype=jnp.float32)
    clf_pm = VideoClassifier.from_model(model, names, batch_size=2,
                                        compute_dtype=jnp.float32,
                                        patch_major=True)
    clips = np.random.RandomState(1).randint(0, 255, (2, 2, 32, 32, 3),
                                             np.uint8)
    np.testing.assert_allclose(clf_pm.classify_clips(clips),
                               clf.classify_clips(clips), atol=2e-4)


def test_patch_major_w8a8_classifier_close():
    import jax.numpy as jnp
    from gava_clip_tpu.models.vision import VisionConfig
    from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig
    from gava_clip_tpu.serve import VideoClassifier
    tf = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    cfg = VitaClipConfig(
        vision=VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                            patch_size=(16, 16), heads=2, layers=2,
                            mlp_factor=2.0, embed_dim=16,
                            use_summary_token=True, use_local_prompts=True,
                            use_global_prompts=True, num_global_prompts=2),
        num_classes=3, zeroshot_evaluation=True)
    model = VitaClip(cfg, zeroshot_text_features=tf)
    names = ["a", "b", "c"]
    clf = VideoClassifier.from_model(model, names, batch_size=2,
                                     compute_dtype=jnp.float32)
    clf_pm = VideoClassifier.from_model(model, names, batch_size=2,
                                        compute_dtype=jnp.float32,
                                        quantize="w8a8", patch_major=True)
    # int8 sidecar exists and quantizes the FOLDED kernel
    assert "kernel_q8" in clf_pm.params["visual"]["patch_embed"]
    clips = np.random.RandomState(1).randint(0, 255, (2, 2, 32, 32, 3),
                                             np.uint8)
    np.testing.assert_allclose(clf_pm.classify_clips(clips),
                               clf.classify_clips(clips), atol=0.05)


def test_patch_major_w8a8_mesh_classifier_matches_single():
    """patch_major + w8a8 + 2-device data mesh (the full production serving
    composition: folded normalization, int8 sidecar patch GEMM, shard_map)
    must reproduce the single-device probabilities. Pallas serving kernels
    run interpret-mode under the mesh via force_tpu_kernels."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from gava_clip_tpu.ops.int8_matmul import force_tpu_kernels
    from gava_clip_tpu.models.text import TextConfig
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
    model = VitaClip(cfg, zeroshot_text_features=tf)
    names = ["a", "b", "c"]
    rs = np.random.RandomState(3)
    clips = rs.randint(0, 255, (4, 2, 32, 32, 3), np.uint8)

    force_tpu_kernels(True)
    try:
        p0 = VideoClassifier.from_model(
            model, names, batch_size=4, quantize="w8a8",
            attn_impl="flash", patch_major=True).warmup().classify_clips(
            clips)
        mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
        p1 = VideoClassifier.from_model(
            model, names, batch_size=4, quantize="w8a8",
            attn_impl="flash", patch_major=True,
            mesh=mesh).warmup().classify_clips(clips)
    finally:
        force_tpu_kernels(False)
    np.testing.assert_allclose(p0, p1, atol=1e-5)
    np.testing.assert_allclose(p0.sum(-1), 1.0, atol=1e-3)
