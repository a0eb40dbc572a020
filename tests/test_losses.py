"""Golden tests for losses vs reference training/loss_utils.py."""

import numpy as np

import jax.numpy as jnp

from gava_clip_tpu.train.losses import (cross_entropy, focal_ordinal_weight,
                                        sigmoid_focal_loss,
                                        cosine_similarity_nce, info_nce)


def _rand_logits(n=8, c=4, seed=0):
    rs = np.random.RandomState(seed)
    return rs.randn(n, c).astype(np.float32), rs.randint(0, c, size=n)


def test_cross_entropy_matches_torch(reference_modules):
    import torch
    logits, labels = _rand_logits()
    want = torch.nn.CrossEntropyLoss(reduction="none")(
        torch.from_numpy(logits), torch.from_numpy(labels)).numpy()
    got = np.asarray(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_focal_ordinal_weight_matches_reference(reference_modules):
    import torch
    fo = reference_modules["loss_utils"].categorical_ordinal_focal_weight(
        gamma=2.0, alpha=0.25, beta=0.2, scale=1.0)
    logits, labels = _rand_logits(seed=1)
    want = fo(torch.from_numpy(logits), torch.from_numpy(labels)).numpy()
    got = np.asarray(focal_ordinal_weight(jnp.asarray(logits), jnp.asarray(labels),
                                          gamma=2.0, alpha=0.25, beta=0.2))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_sigmoid_focal_loss_matches_reference(reference_modules):
    import torch
    logits, labels = _rand_logits(seed=2)
    for use_focal in (False, True):
        ref = reference_modules["loss_utils"].sigmoid_focal_loss(
            use_focal=use_focal, scale=0.1)
        want = ref(torch.from_numpy(logits), torch.from_numpy(labels)).numpy()
        got = np.asarray(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                                            use_focal=use_focal, scale=0.1))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_cosine_nce_matches_reference(reference_modules):
    import torch
    rs = np.random.RandomState(3)
    sim = rs.randn(5, 5).astype(np.float32)
    ref = reference_modules["loss_utils"].cosine_similarity_nce_loss(
        temperature=10.0, weight=2.0)
    want = float(ref(torch.from_numpy(sim)))
    got = float(cosine_similarity_nce(jnp.asarray(sim), temperature=10.0, weight=2.0))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_info_nce_matches_reference(reference_modules):
    import torch
    logits, labels = _rand_logits(seed=4)
    ref = reference_modules["loss_utils"].InfoNCE_loss(n_cls=4, temperature=0.1,
                                                       weight=1.0)
    want = float(ref(torch.from_numpy(logits), torch.from_numpy(labels)))
    got = float(info_nce(jnp.asarray(logits), jnp.asarray(labels), n_cls=4,
                         temperature=0.1))
    np.testing.assert_allclose(got, want, atol=1e-5)
