"""
Caption loss: label smoothing KL with SUM reduction.

Numerical parity with reference mart/loss_caption.py:10-46:
loss = sum over valid tokens of KL(smoothed_one_hot || softmax(logits)),
where the smoothed target puts `1 - ls` on the gold class and
`ls / (V - 1)` elsewhere; tokens with label == ignore_index (-1) are
dropped. The constant sum p*log(p) term is included (F.kl_div semantics) so
logged loss values match the reference exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE = -1


def label_smoothing_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                         label_smoothing: float, vocab_size: int,
                         ignore_index: int = IGNORE) -> jnp.ndarray:
    """
    Args:
        logits: (..., V) raw scores
        labels: (...) int labels in [-1, V-1]; ignore_index dropped

    Returns scalar sum loss (f32).
    """
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    log_probs = jax.nn.log_softmax(logits, axis=-1)

    confidence = 1.0 - label_smoothing
    smoothing_value = label_smoothing / (vocab_size - 1)

    # cross term: sum_c p_c * (-log q_c)
    gold_logq = jnp.take_along_axis(log_probs, safe_labels[..., None],
                                    axis=-1)[..., 0]
    sum_logq = jnp.sum(log_probs, axis=-1)
    cross = -(confidence * gold_logq
              + smoothing_value * (sum_logq - gold_logq))
    # constant entropy term of the smoothed target (F.kl_div includes it)
    p_logp = (confidence * jnp.log(confidence)
              + (vocab_size - 1) * smoothing_value
              * jnp.log(smoothing_value))
    per_token = cross + p_logp
    return jnp.sum(jnp.where(valid, per_token, 0.0))


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       ignore_index: int = IGNORE) -> jnp.ndarray:
    """nn.CrossEntropyLoss(ignore_index=-1) parity: MEAN over valid tokens
    (used when label_smoothing == 0, reference model.py:1397)."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, safe_labels[..., None],
                               axis=-1)[..., 0]
    total = jnp.sum(jnp.where(valid, nll, 0.0))
    return total / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)


def token_accuracy_counts(logits: jnp.ndarray, labels: jnp.ndarray,
                          ignore_index: int = IGNORE):
    """(n_correct, n_valid) for the token-accuracy meters (reference
    trainer_caption.py:39 cal_performance). Returned as f32: mixing int32
    and f32 all-reduces in one SPMD program deadlocks the XLA CPU
    in-process communicator (independent collectives race in the thunk
    executor) — keeping every cross-device reduction f32 lets XLA combine
    them. Counts are exact integers well below 2^24."""
    pred = jnp.argmax(logits, axis=-1)
    valid = labels != ignore_index
    correct = (pred == labels) & valid
    return (jnp.sum(correct.astype(jnp.float32)),
            jnp.sum(valid.astype(jnp.float32)))
