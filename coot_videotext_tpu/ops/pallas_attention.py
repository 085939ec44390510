"""
Fused masked multi-head attention as a Pallas TPU kernel.

One kernel fuses QK^T -> scale -> -INF mask fill -> softmax -> PV per
(batch, head) grid cell, keeping the (Lq, Lk) score matrix in VMEM only —
the score tensor never touches HBM (the XLA path materializes it between
the two einsums unless fusion kicks in). COOT sequences are short
(<= max_frames 80 video tokens / <= 512 text tokens), so a whole (Lq, Lk)
tile fits VMEM comfortably and the grid is simply B*H.

Numerics match models/attention.py masked_softmax exactly: f32 scores,
-INF fill (typext.INF = 32752, the fp16-safe infinity), softmax over the
key axis. A custom VJP recomputes the probabilities in the backward kernel
(flash-style) instead of storing them.

MEASURED on the real v5e chip with chain-difference timing (the tunnel's
block_until_ready is a no-op; see bench.py for the methodology): the fused
kernel wins only at long sequences — n=512 L=512 dh=48: bwd 2.7ms vs XLA
5.6ms (fwd at/under measurement noise vs 1.8ms); a wash at L=128; and
LOSES badly at COOT's stock L=80 (n=4096 dh=48: bwd 7.7ms vs 0.6ms —
recomputing probabilities costs more than XLA's materialize-and-reuse
when the whole score row fits in VMEM). The auto heuristic in
models/attention.py therefore only engages this kernel for Lk >= 256.

Opt-in/force: models.attention.MultiHeadAttention(use_pallas=True/False)
or the COOT_TPU_PALLAS_ATTENTION=1/0 environment variable. Falls back to
the XLA path on CPU (pallas TPU kernels don't run on the CPU backend).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coot_videotext_tpu.typext import INF


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    """o = softmax(mask_fill(q k^T * scale)) v for a block of C cells."""
    q = q_ref[...].astype(jnp.float32)        # (C, Lq, Dh)
    k = k_ref[...].astype(jnp.float32)        # (C, Lk, Dh)
    v = v_ref[...].astype(jnp.float32)        # (C, Lk, Dh)
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale   # (C, Lq, Lk)
    scores = jnp.where(mask_ref[...] != 0, scores, -INF)
    # numerically-stable softmax in VMEM
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    o_ref[...] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float):
    """Recompute p, then dv = p^T g; dp = g v^T; ds = p*(dp - rowsum(dp*p));
    dq = ds k * scale; dk = ds^T q * scale."""
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    scores = jnp.where(mask_ref[...] != 0, scores, -INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)         # (C, Lq, Lk)

    dv_ref[...] = jax.lax.dot_general(
        p, g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        g, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (C, Lq, Lk)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[...] = (jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,)))) * scale).astype(dq_ref.dtype)
    dk_ref[...] = (jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


def _pick_cells_per_block(n: int, lq: int, lk: int, dh: int,
                          bwd: bool = False) -> int:
    """Cells per grid step: amortize grid overhead for short sequences
    while keeping the working set within a VMEM budget. The backward
    kernel holds ~2x the live tiles (7 in/out blocks + 4 score-sized
    intermediates), so it gets a smaller budget."""
    bytes_per_cell = 4 * (2 * (lq * dh * 2 + lk * dh * 2) + 4 * lq * lk)
    budget = (5 if bwd else 12) * 1024 * 1024
    c = max(1, min(n, budget // max(bytes_per_cell, 1), 32))
    while n % c:
        c -= 1
    return c


def _specs(c: int):
    blk = lambda *s: pl.BlockSpec(  # noqa: E731
        (c, *s), lambda i: (i,) + (0,) * len(s),
        memory_space=pltpu.VMEM)
    return blk


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pallas_masked_attention(q: jnp.ndarray, k: jnp.ndarray,
                            v: jnp.ndarray, mask: jnp.ndarray,
                            scale: float) -> jnp.ndarray:
    """
    Args:
        q: (N, Lq, Dh) where N = batch*heads (flattened grid axis)
        k, v: (N, Lk, Dh)
        mask: (N, Lq, Lk) bool, True = attend
        scale: score scale (1/sqrt(d_head))

    Returns (N, Lq, Dh), dtype of q.
    """
    return _attention_fwd_call(q, k, v, mask, scale)


def _attention_fwd_call(q, k, v, mask, scale):
    n, lq, dh = q.shape
    lk = k.shape[1]
    c = _pick_cells_per_block(n, lq, lk, dh)
    blk = _specs(c)
    mask = mask.astype(jnp.int8)  # 4x less mask bandwidth than s32
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((n, lq, dh), q.dtype),
        grid=(n // c,),
        in_specs=[blk(lq, dh), blk(lk, dh), blk(lk, dh), blk(lq, lk)],
        out_specs=blk(lq, dh),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * lq * lk * dh, transcendentals=n * lq * lk,
            bytes_accessed=4 * n * (lq * dh * 2 + lk * dh * 2 + lq * lk)),
    )(q, k, v, mask)


def _attention_fwd(q, k, v, mask, scale):
    return _attention_fwd_call(q, k, v, mask, scale), (q, k, v, mask)


def _attention_bwd(scale, residuals, g):
    q, k, v, mask = residuals
    n, lq, dh = q.shape
    lk = k.shape[1]
    c = _pick_cells_per_block(n, lq, lk, dh, bwd=True)
    blk = _specs(c)
    mask = mask.astype(jnp.int8)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        grid=(n // c,),
        in_specs=[blk(lq, dh), blk(lk, dh), blk(lk, dh), blk(lq, lk),
                  blk(lq, dh)],
        out_specs=(blk(lq, dh), blk(lk, dh), blk(lk, dh)),
        cost_estimate=pl.CostEstimate(
            flops=10 * n * lq * lk * dh, transcendentals=n * lq * lk,
            bytes_accessed=4 * n * (lq * dh * 3 + lk * dh * 4
                                    + lq * lk)),
    )(q, k, v, mask, g)
    return dq, dk, dv, None


pallas_masked_attention.defvjp(_attention_fwd, _attention_bwd)


def masked_attention_reference(q, k, v, mask, scale):
    """XLA reference path with identical numerics (for tests/benchmarks)."""
    scores = jnp.einsum("nqd,nkd->nqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    scores = jnp.where(mask, scores, -INF)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("nqk,nkd->nqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


def pallas_attention_available() -> bool:
    return jax.default_backend() == "tpu"
