"""Loss numerics: masked contrastive loss vs a direct numpy port of the
reference formulas (loss_fn.py:51-100), cycle-consistency structure."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coot_videotext_tpu.train.losses import (
    contrastive_loss, cycle_consistency_loss, l2_normalize)


def _np_contrastive(im, s, margin):
    """Direct numpy port of reference ContrastiveLoss.forward (norm=True)."""
    scores = im @ s.T
    diag = np.diag(scores)
    cost_s = np.clip(margin + scores - diag[:, None], 0, None)
    cost_im = np.clip(margin + scores - diag[None, :], 0, None)
    np.fill_diagonal(cost_s, 0)
    np.fill_diagonal(cost_im, 0)
    return (cost_s.sum() + cost_im.sum()) / (im.shape[0] * s.shape[0])


def test_contrastive_matches_reference_formula():
    rng = np.random.RandomState(0)
    im = rng.randn(8, 16).astype(np.float32)
    s = rng.randn(8, 16).astype(np.float32)
    im = im / np.linalg.norm(im, axis=-1, keepdims=True)
    s = s / np.linalg.norm(s, axis=-1, keepdims=True)
    expected = _np_contrastive(im, s, 0.2)
    got = contrastive_loss(jnp.asarray(im), jnp.asarray(s), 0.2)
    assert float(got) == pytest.approx(expected, rel=1e-5)


def test_contrastive_masked_equals_unpadded():
    """Padding with masked slots must reproduce the unpadded loss exactly,
    including the n_valid^2 normalizer."""
    rng = np.random.RandomState(1)
    n, d, pad = 6, 8, 4
    im = rng.randn(n, d).astype(np.float32)
    s = rng.randn(n, d).astype(np.float32)
    im = im / np.linalg.norm(im, axis=-1, keepdims=True)
    s = s / np.linalg.norm(s, axis=-1, keepdims=True)
    expected = _np_contrastive(im, s, 0.2)

    im_pad = np.concatenate([im, rng.randn(pad, d).astype(np.float32)])
    s_pad = np.concatenate([s, rng.randn(pad, d).astype(np.float32)])
    valid = np.array([True] * n + [False] * pad)
    got = contrastive_loss(jnp.asarray(im_pad), jnp.asarray(s_pad), 0.2,
                           jnp.asarray(valid), jnp.asarray(valid))
    assert float(got) == pytest.approx(expected, rel=1e-5)


def test_contrastive_padding_invariance():
    """Changing the VALUES of padded slots must not change the loss."""
    rng = np.random.RandomState(2)
    im = rng.randn(10, 8).astype(np.float32)
    s = rng.randn(10, 8).astype(np.float32)
    valid = np.array([True] * 7 + [False] * 3)
    l1 = contrastive_loss(jnp.asarray(im), jnp.asarray(s), 0.2,
                          jnp.asarray(valid), jnp.asarray(valid))
    im2, s2 = im.copy(), s.copy()
    im2[7:] += 5.0
    s2[7:] -= 3.0
    l2 = contrastive_loss(jnp.asarray(im2), jnp.asarray(s2), 0.2,
                          jnp.asarray(valid), jnp.asarray(valid))
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)


def test_l2_normalize():
    x = np.array([[3.0, 4.0], [0.0, 0.0]], np.float32)
    out = np.asarray(l2_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(out[0], [0.6, 0.8], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.0, 0.0], atol=1e-6)  # eps guard


def test_cycle_consistency_basic():
    """Identical aligned clips/sentences -> soft index == hard index -> ~0
    loss; shuffled target ordering gives a larger loss."""
    rng = np.random.RandomState(3)
    b, n, d = 4, 5, 8
    clip = rng.randn(b, n, d).astype(np.float32) * 3
    valid = np.ones((b, n), bool)
    num = np.full((b,), n)
    loss_aligned, loss_aligned2 = cycle_consistency_loss(
        jnp.asarray(clip), jnp.asarray(valid), jnp.asarray(num),
        jnp.asarray(clip), jnp.asarray(valid), jnp.asarray(num),
        rng=jax.random.PRNGKey(0))
    assert float(loss_aligned) < 0.05
    assert float(loss_aligned2) < 0.05

    # partial masking: loss must not depend on padded values
    valid2 = valid.copy()
    valid2[:, 3:] = False
    num2 = valid2.sum(-1)
    clip_a = clip.copy()
    clip_b = clip.copy()
    clip_b[:, 3:] += 100.0
    la, _ = cycle_consistency_loss(
        jnp.asarray(clip_a), jnp.asarray(valid2), jnp.asarray(num2),
        jnp.asarray(clip_a), jnp.asarray(valid2), jnp.asarray(num2),
        rng=jax.random.PRNGKey(1))
    lb, _ = cycle_consistency_loss(
        jnp.asarray(clip_b), jnp.asarray(valid2), jnp.asarray(num2),
        jnp.asarray(clip_b), jnp.asarray(valid2), jnp.asarray(num2),
        rng=jax.random.PRNGKey(1))
    assert float(la) == pytest.approx(float(lb), rel=1e-5)
