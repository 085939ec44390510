"""
Retrieval losses: bidirectional max-margin (VSE-style) contrastive loss and
the clip<->sentence cycle-consistency loss.

Numerical parity with reference coot/loss_fn.py, generalized to masked
static-shape inputs (the reference operates on dynamically-sized flat arrays;
here padded slots carry a validity mask and contribute exactly zero):
    - ContrastiveLoss (:51-100): cost_s/cost_im margins vs the diagonal,
      diagonal cleared, sum normalized by (rows * cols) -- with masking the
      normalizer is (n_valid_rows * n_valid_cols), matching the reference's
      value on unpadded data bit-for-bit.
    - CycleConsistencyLoss (:111-387): soft nearest neighbors via masked
      -L2 softmax, index-regression loss, one random valid index sampled per
      sequence (num_samples=1 default, th.multinomial -> jax categorical).

All loss math in float32.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from coot_videotext_tpu.typext import INF


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """
    torch F.normalize parity: x / max(||x||, eps). Written on the squared
    norm so the gradient at x=0 is finite (d||x||/dx = x/||x|| is NaN at
    exactly zero, and padded clip/sentence slots ARE exactly zero — their
    upstream loss gradient is zero, but 0 * NaN would still poison the
    update). Value is identical: sqrt(max(||x||^2, eps^2)) == max(||x||, eps).
    """
    x = x.astype(jnp.float32)
    norm_sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(norm_sq, eps * eps))


def cosine_sim(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot-product scores of two (already normalized) embedding sets."""
    return jnp.dot(a, b.T, preferred_element_type=jnp.float32)


def contrastive_loss(im: jnp.ndarray, s: jnp.ndarray,
                     margin: float,
                     valid_im: Optional[jnp.ndarray] = None,
                     valid_s: Optional[jnp.ndarray] = None,
                     max_violation: bool = False,
                     norm: bool = True) -> jnp.ndarray:
    """
    Bidirectional max-margin contrastive loss (reference loss_fn.py:51).

    Args:
        im: (N, D) embeddings (normalized by caller, as in the reference)
        s: (N, D) embeddings; pair i <-> i is the positive
        valid_im / valid_s: optional (N,) validity masks for padded slots
        max_violation: keep only the hardest negative per query
        norm: divide by N_im * N_s (the reference always normalizes)
    """
    im = im.astype(jnp.float32)
    s = s.astype(jnp.float32)
    n = im.shape[0]
    scores = cosine_sim(im, s)
    diagonal = jnp.diagonal(scores)
    d1 = diagonal[:, None]  # compare to column scores
    d2 = diagonal[None, :]  # compare to row scores

    cost_s = jnp.maximum(margin + scores - d1, 0.0)
    cost_im = jnp.maximum(margin + scores - d2, 0.0)

    eye = jnp.eye(n, dtype=bool)
    pair_valid = None
    if valid_im is not None or valid_s is not None:
        v_im = (valid_im if valid_im is not None
                else jnp.ones((n,), bool)).astype(bool)
        v_s = (valid_s if valid_s is not None
               else jnp.ones((n,), bool)).astype(bool)
        pair_valid = v_im[:, None] & v_s[None, :]
        keep = pair_valid & ~eye
    else:
        keep = ~eye
    cost_s = jnp.where(keep, cost_s, 0.0)
    cost_im = jnp.where(keep, cost_im, 0.0)

    if max_violation:
        cost_s = jnp.max(cost_s, axis=1)
        cost_im = jnp.max(cost_im, axis=0)

    total = jnp.sum(cost_s) + jnp.sum(cost_im)
    if norm:
        if pair_valid is not None:
            n_im = jnp.sum(v_im.astype(jnp.float32))
            n_s = jnp.sum(v_s.astype(jnp.float32))
            total = total / jnp.maximum(n_im * n_s, 1.0)
        else:
            total = total / float(n * n)
    return total


def _mean_sq_distance(c: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Mean squared distance over the feature axis (reference :103)."""
    return jnp.mean(jnp.square(c - s), axis=-1)


def _soft_nn(source_emb: jnp.ndarray, source_mask: jnp.ndarray,
             target_emb: jnp.ndarray, target_mask: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """
    Soft nearest neighbors (reference loss_fn.py:227 get_soft_nn).

    Args:
        source_emb: (B, Ls, D); source_mask: (B, Ls) True = valid
        target_emb: (B, Lt, D); target_mask: (B, Lt)

    Returns:
        (soft_nn (B, Ls, D), weights (B, Ls, Lt), raw distance (B, Ls, Lt))
    """
    total_mask = source_mask[:, :, None] & target_mask[:, None, :]
    distance = -_mean_sq_distance(source_emb[:, :, None, :],
                                  target_emb[:, None, :, :])
    distance = jnp.where(total_mask, distance, -INF)
    weights = jax.nn.softmax(distance, axis=-1)
    soft_nn = jnp.sum(target_emb[:, None, :, :] * weights[:, :, :, None],
                      axis=2)
    return soft_nn, weights, distance


def _index_losses(emb_mask: jnp.ndarray, beta: jnp.ndarray,
                  lambda_gauss: float = 1.0, var_denom_eps: float = 1e-8,
                  var_log_eps: float = 1.0
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """
    Index-regression losses (reference compute_loss_index_gauss :321).

    Args:
        emb_mask: (B, L) True = valid
        beta: (B, L, L) soft-NN weights of the second cycle hop
    """
    max_len = emb_mask.shape[1]
    idx_orig = jnp.arange(max_len, dtype=jnp.float32)[None, :]
    index_nn = jnp.sum(idx_orig[:, None, :] * beta, axis=-1)  # (B, L)
    # distance of each soft index to each original index
    pair_mask = emb_mask[:, :, None] & emb_mask[:, None, :]
    distance = jnp.square(index_nn[:, :, None] - idx_orig[:, None, :])
    distance = jnp.where(pair_mask, distance, 0.0)
    loss_simple = jnp.diagonal(distance, axis1=-2, axis2=-1)  # (B, L)
    variance = jnp.sum(distance * beta, axis=-1)
    var_reg = lambda_gauss * 0.5 * jnp.log(var_log_eps + variance)
    # reference quirk (loss_fn.py:379): masked_fill_(emb_mask, 0) zeroes the
    # regularizer on VALID positions; reproduced verbatim (gauss path is off
    # by default so this only matters if weight_index_gauss != 0).
    var_reg = jnp.where(emb_mask, 0.0, var_reg)
    loss_gauss = loss_simple / (variance + var_denom_eps) + var_reg
    return loss_simple, loss_gauss, var_reg


def _subsampled_total(l_seq: jnp.ndarray, emb_mask: jnp.ndarray,
                      emb_lens: jnp.ndarray, num_samples: int,
                      rng: Optional[jax.Array],
                      batch_valid: Optional[jnp.ndarray] = None
                      ) -> jnp.ndarray:
    """
    Subsample per-position losses (reference get_total_loss :277-320,
    num_samples=1 default: one multinomial draw over valid positions per
    sequence, mean over draws, mean over batch). `batch_valid` masks rows
    belonging to batch padding (static-shape final batch); the mean then
    runs over the REAL batch only, matching the reference's dynamic batch.
    """
    if batch_valid is None:
        n_rows = jnp.float32(l_seq.shape[0])
        row_w = jnp.ones((l_seq.shape[0],), jnp.float32)
    else:
        row_w = batch_valid.astype(jnp.float32)
        n_rows = jnp.maximum(jnp.sum(row_w), 1.0)
    if num_samples == -1 or rng is None:
        total = jnp.sum(jnp.where(emb_mask, l_seq, 0.0), axis=-1)
        total = total / jnp.maximum(emb_lens.astype(jnp.float32), 1.0)
        return jnp.sum(total * row_w) / n_rows
    assert num_samples == 1, "only num_samples in {-1, 1} supported"
    logits = jnp.where(emb_mask, 0.0, -jnp.inf)
    idx = jax.random.categorical(rng, logits, axis=-1)  # (B,)
    picked = jnp.take_along_axis(l_seq, idx[:, None], axis=1)[:, 0]
    return jnp.sum(picked * row_w) / n_rows


def cycle_consistency_loss(
        clip_emb: jnp.ndarray, clip_valid: jnp.ndarray,
        clip_num: jnp.ndarray,
        sent_emb: jnp.ndarray, sent_valid: jnp.ndarray,
        sent_num: jnp.ndarray, *,
        rng: Optional[jax.Array] = None,
        num_samples: int = 1,
        weight_index_simple: float = 1.0,
        weight_index_gauss: float = 0.0,
        batch_valid: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Clip<->sentence cycle consistency (reference CycleConsistencyLoss :111).
    Full cycles only (compute_half_cycles=False default).

    Args:
        clip_emb: (B, Nc, D) UN-normalized clip embeddings
        clip_valid: (B, Nc) True = real clip; clip_num: (B,)
        sent_emb / sent_valid / sent_num: text side
        rng: PRNG key for the index subsampling

    Returns:
        (clip_clip_loss, sent_sent_loss) scalars
    """
    clip_emb = clip_emb.astype(jnp.float32)
    sent_emb = sent_emb.astype(jnp.float32)
    clip_mask = clip_valid.astype(bool)
    sent_mask = sent_valid.astype(bool)

    def one_direction(src, src_mask, src_num, tgt, tgt_mask, rng_dir):
        nn_fwd, _, _ = _soft_nn(src, src_mask, tgt, tgt_mask)
        _, beta, _ = _soft_nn(nn_fwd, src_mask, src, src_mask)
        loss_simple, loss_gauss, var_reg = _index_losses(src_mask, beta)
        l_seq = (loss_gauss + var_reg) * weight_index_gauss \
            + loss_simple * weight_index_simple
        return _subsampled_total(l_seq, src_mask, src_num, num_samples,
                                 rng_dir, batch_valid)

    rng_c = rng_s = None
    if rng is not None:
        rng_c, rng_s = jax.random.split(rng)
    clip_clip = one_direction(clip_emb, clip_mask, clip_num,
                              sent_emb, sent_mask, rng_c)
    sent_sent = one_direction(sent_emb, sent_mask, sent_num,
                              clip_emb, clip_mask, rng_s)
    return clip_clip, sent_sent


def compute_total_retrieval_loss(
        visual: Dict[str, jnp.ndarray], text: Dict[str, jnp.ndarray],
        cfg_weights: Dict[str, float], margin: float,
        loss_cycle_cons: float,
        rng: Optional[jax.Array] = None,
        batch_valid: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """
    Total retrieval loss (reference trainer_retrieval.py:148-233):
    weighted alignment + clustering contrastive terms on L2-normalized
    embeddings, plus cycle consistency on raw clip/sentence embeddings.

    Note the reference quirk at trainer_retrieval.py:181: the context-internal
    cluster term is gated on weight_context_internal but WEIGHTED by
    weight_low_internal; reproduced (weight is 0 in all shipped configs).

    Args:
        visual / text: outputs of RetrievalModel encode_visual/encode_text
        cfg_weights: keys weight_high, weight_low, weight_context,
            weight_high_internal, weight_low_internal, weight_context_internal
    """
    vid_ctx_n = l2_normalize(visual["vid_context"])
    vid_emb_n = l2_normalize(visual["vid_emb"])
    par_ctx_n = l2_normalize(text["par_context"])
    par_emb_n = l2_normalize(text["par_emb"])

    b, nc, d = visual["clip_emb"].shape
    clip_valid = visual["clip_valid"].astype(bool)
    sent_valid = text["sent_valid"].astype(bool)
    bv = None
    if batch_valid is not None:
        bv = batch_valid.astype(bool)
        clip_valid = clip_valid & bv[:, None]
        sent_valid = sent_valid & bv[:, None]
    clip_flat = l2_normalize(visual["clip_emb"].reshape(b * nc, d))
    clip_valid_flat = clip_valid.reshape(b * nc)
    ns = text["sent_emb"].shape[1]
    sent_flat = l2_normalize(text["sent_emb"].reshape(b * ns, -1))
    sent_valid_flat = sent_valid.reshape(b * ns)
    assert nc == ns, "clips and sentences must be aligned 1:1"

    w = cfg_weights

    def align(a, ta, va=None, vt=None):
        return contrastive_loss(a, ta, margin, va, vt)

    def cluster(a, ta, va=None, vt=None):
        return (contrastive_loss(a, a, margin, va, va)
                + contrastive_loss(ta, ta, margin, vt, vt)) / 2

    loss = jnp.float32(0.0)
    parts: Dict[str, jnp.ndarray] = {}
    if w["weight_high"] != 0:
        parts["align_high"] = align(vid_emb_n, par_emb_n, bv, bv)
        loss = loss + w["weight_high"] * parts["align_high"]
    if w["weight_low"] != 0:
        parts["align_low"] = align(clip_flat, sent_flat, clip_valid_flat,
                                   sent_valid_flat)
        loss = loss + w["weight_low"] * parts["align_low"]
    if w["weight_context"] != 0:
        parts["align_context"] = align(vid_ctx_n, par_ctx_n, bv, bv)
        loss = loss + w["weight_context"] * parts["align_context"]
    if w["weight_high_internal"] != 0:
        parts["cluster_high"] = cluster(vid_emb_n, par_emb_n, bv, bv)
        loss = loss + w["weight_high_internal"] * parts["cluster_high"]
    if w["weight_low_internal"] != 0:
        parts["cluster_low"] = cluster(clip_flat, sent_flat,
                                       clip_valid_flat, sent_valid_flat)
        loss = loss + w["weight_low_internal"] * parts["cluster_low"]
    if w["weight_context_internal"] != 0:
        parts["cluster_context"] = cluster(vid_ctx_n, par_ctx_n, bv, bv)
        # reference reuses weight_low_internal here (trainer_retrieval.py:181)
        loss = loss + w["weight_low_internal"] * parts["cluster_context"]

    contrastive_total = loss
    parts["loss_contrastive"] = contrastive_total

    if loss_cycle_cons != 0:
        cc_clip, cc_sent = cycle_consistency_loss(
            visual["clip_emb"], visual["clip_valid"], visual["clip_num"],
            text["sent_emb"], text["sent_valid"], text["sent_num"], rng=rng,
            batch_valid=bv)
        parts["loss_cc"] = loss_cycle_cons * (cc_clip + cc_sent)
        loss = loss + parts["loss_cc"]
    else:
        parts["loss_cc"] = jnp.float32(0.0)

    parts["loss_total"] = loss
    return loss, parts
