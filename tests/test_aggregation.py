"""IWA aggregation math vs the reference aux_numpy implementation."""

import sys

import numpy as np
import pytest

from gava_clip_tpu.utils.aggregation import (aggregation_weights,
                                             aggregate_logits,
                                             aggregate_text_features,
                                             model_gram, source_fit_stats,
                                             truncated_pinv)


@pytest.fixture(scope="module")
def ref_aux(reference_modules):
    sys.path.insert(0, "/root/reference/utils")
    import importlib
    return importlib.import_module("aux_numpy")


def test_truncated_pinv_matches_reference(ref_aux):
    rs = np.random.RandomState(0)
    a = rs.randn(5, 5)
    a = a @ a.T  # make singular spectrum spread
    for k in (-1, 2, 3):
        want = ref_aux.pinv_with_singular_values(a.copy(), num_singular_values=k,
                                                 rcond=1e-1)
        got = truncated_pinv(a, num_singular_values=k, rcond=1e-1)
        np.testing.assert_allclose(got, want, atol=1e-10)


def test_source_fit_and_gram():
    rs = np.random.RandomState(1)
    logits = rs.randn(20, 3)
    labels = rs.randint(0, 3, 20)
    f_mat, f_scalar = source_fit_stats(logits, labels, 3)
    assert f_mat.shape == (20, 3)
    # each row has mass only at the true class
    assert (f_mat[np.arange(20), labels] > 0).all()
    assert 0 < f_scalar < 1

    g = [rs.randn(20, 3) for _ in range(3)]
    gram = model_gram(g)
    assert gram.shape == (3, 3)
    np.testing.assert_allclose(gram, gram.T, atol=1e-12)


def test_aggregation_recovers_better_model():
    """A model matching the target should out-weigh a random one."""
    rs = np.random.RandomState(2)
    n, c = 200, 3
    labels = rs.randint(0, c, n)
    good = np.eye(c)[labels] * 4 + rs.randn(n, c) * 0.1
    bad = rs.randn(n, c)
    f_good = source_fit_stats(good, labels, c)[1]
    f_bad = source_fit_stats(bad, labels, c)[1]
    w = aggregation_weights([good, bad], [f_good, f_bad], rcond=1e-6)
    # the weights solve Gram(G) w = F (no singular values pruned here)
    np.testing.assert_allclose(model_gram([good, bad]) @ w,
                               [f_good, f_bad], atol=1e-8)
    agg = aggregate_logits(w, [good, bad])
    acc = (agg.argmax(-1) == labels).mean()
    acc_bad = (bad.argmax(-1) == labels).mean()
    assert acc > acc_bad


def test_aggregate_text_features_shape():
    rs = np.random.RandomState(3)
    tfs = [rs.randn(3, 16) for _ in range(2)]
    w = np.array([0.7, 0.3])
    agg = aggregate_text_features(w, tfs)
    assert agg.shape == (3, 16)
    np.testing.assert_allclose(agg, (0.7 * tfs[0] + 0.3 * tfs[1]) / 1.0)
