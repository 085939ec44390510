"""
Fused GenPool (generalized attention pooling) as one Pallas TPU kernel
pair: per-head MLP -> masked softmax over the sequence -> weighted sum,
forward and full custom VJP.

Why: GenPool (models/poolers.py, reference nntrainer/poolers.py:111-205)
is ~5.5 ms of the ~31 ms model block on the yc2 bench (docs/
PERFORMANCE.md ablation). Unfused it is 5 HBM-bound stages — two
matmuls with a (S*L, 768) intermediate written+reread, a masked softmax
over the sequence axis, up to three dropout masks, and a weighted-sum
reduction that rereads the input. Fused, each (L, D) feature tile is
read ONCE into VMEM, the 768-wide intermediate never leaves the core,
the masks come from the on-core hardware PRNG, and only the (S, D)
pooled rows are written. The backward kernel recomputes everything from
the same VMEM-resident input (re-seeding the PRNG for bit-identical
masks, like ops/pallas_dropout.py) and emits ALL cotangents — df is
needed here, unlike the input-FC kernel, because GenPool consumes the
encoder output.

Weight layout: the caller passes the FLAT layout the module already
builds (models/poolers.py GenPool): w1 (D, H) = head-interleaved first
projection, w2 (H, D) = block-diagonal per-head second projection.
dW2 is computed dense; the VJP of the module's block-diagonal
construction extracts the diagonal blocks, which equal the true
per-head gradients.

Numerics: matmuls take compute-dtype inputs with f32 accumulation; bias
/ activation / softmax / reductions in f32. The softmax fills invalid
positions with the finite -INF=32752 exactly like
models/attention.masked_softmax's fill, so all-padded rows (invalid
pack slots) produce the same harmless uniform weights as the unfused
path. gelu is the exact erf form (shared A&S polynomial with
ops/pallas_input_fc). Dropout keeps iff bits >= floor(rate * 2^32) —
same Bernoulli distribution as the module's Dropout, DIFFERENT stream
(the reference's torch stream differs from both); with rate == 0 or
deterministic=True the kernel is a pure function of its inputs and
matches the module's math to rounding.

A numerics quirk worth knowing: deterministically, b2's gradient is
IDENTICALLY zero — b2[d] shifts every valid logit of a softmax column
by the same constant and softmax is shift-invariant (invalid positions
underflow to probability 0 under the -32752 fill). Both this kernel
and autodiff produce only cancellation roundoff for db2; under dropout
(keep2) the uniform shift breaks and b2 goes live.

Gating: OFF by default (COOT_TPU_FUSED_GENPOOL=1 enables). Measured
on v5e at bench shapes (tools/profile_genpool_ab.py): 32.74 ms
unfused vs 32.48 ms fused model block — +0.8%, within noise, i.e. a
documented wash like ops/pallas_attention at L=80 (docs/
PERFORMANCE.md "Measured negative results"). The default stays off
both for that and because under dropout the kernel's hardware-PRNG
stream differs from the module's, which would perturb training
trajectories for no measured win.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coot_videotext_tpu.ops.pallas_input_fc import _erf, _gelu, _gelu_grad

_NEG_INF = 32752.0  # typext.INF — the module's finite masked-fill value
_VMEM_BUDGET = 15 * 1024 * 1024


def fused_genpool_mode(s: int, length: int, d: int, h: int,
                       act: str, itemsize: int = 2):
    """Gate. Returns None (unfused), "compile" (real chip) or
    "interpret" (CI coverage of the full module wiring off-TPU).
    Requires the opt-in env flag (COOT_TPU_FUSED_GENPOOL=1, or
    =interpret for tests), a supported activation, lane alignment of the
    wide dims, and >= 1 block row fitting VMEM."""
    flag = os.environ.get("COOT_TPU_FUSED_GENPOOL", "0")
    if flag not in ("1", "interpret"):
        return None
    if flag == "1" and jax.default_backend() != "tpu":
        return None
    if act not in ("gelu", "relu", "none"):
        return None
    if d % 128 != 0 or h % 128 != 0:
        return None
    if s < 1 or _pick_block_rows(s, length, d, h, itemsize, bwd=True) < 1:
        return None
    return "interpret" if flag == "interpret" else "compile"


def _bwd_footprint(length: int, d: int, h: int, itemsize: int
                   ) -> Tuple[int, int]:
    """(fixed bytes, bytes per block row) of the backward kernel:
    weights in compute dtype + dense f32 dW1/dW2 accumulators fixed;
    per row the f/mask/dout tiles, the f32 recompute temps (pre1, h1,
    h2, softmax pair) and the cotangent temps (dh2, dsm, dpre1, df)."""
    fixed = 2 * itemsize * d * h + 2 * 4 * d * h + 4 * (2 * h + 2 * d)
    per_row = (length * d * (itemsize + 4 * 5) + length * h * 4 * 4
               + length * 4 + d * (4 + itemsize))
    return fixed, per_row


def _pick_block_rows(s: int, length: int, d: int, h: int, itemsize: int,
                     bwd: bool) -> int:
    """Largest legal block-row count fitting VMEM: must divide s AND be a
    multiple of 8 (TPU lowering: a non-final block dim must be 8-aligned
    unless the block spans the whole dim). 0 = no legal blocking."""
    if bwd:
        fixed, per_row = _bwd_footprint(length, d, h, itemsize)
    else:
        fixed = 2 * itemsize * d * h + 4 * (h + d)
        per_row = (length * d * (itemsize + 4 * 3) + length * h * 4 * 2
                   + length * 4 + d * 4)
    cap = int(max(0, (_VMEM_BUDGET - fixed) // max(per_row, 1)))
    cap = min(cap, 256, s)
    if cap >= s:
        return s
    for bs in range(cap - cap % 8, 0, -8):
        if s % bs == 0:
            return bs
    return 0


def _act_fn(pre, act: str):
    if act == "gelu":
        return _gelu(pre)
    if act == "relu":
        return jnp.maximum(pre, 0.0)
    return pre


def _act_grad(pre, act: str):
    if act == "gelu":
        return _gelu_grad(pre)
    if act == "relu":
        return (pre > 0.0).astype(jnp.float32)
    return jnp.ones_like(pre)


def _drop_bits(shape, thresh: int):
    bits = pltpu.prng_random_bits(shape)
    return bits.astype(jnp.uint32) >= jnp.uint32(thresh)


def _recompute(f_ref, mask_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               *, act: str, rate: float, train: bool):
    """Shared fwd math on one VMEM block. The PRNG must already be
    seeded; draw order (h1, h2, sm) is identical in fwd and bwd so the
    regenerated masks are bit-identical. Returns every intermediate the
    backward needs."""
    cdtype = f_ref.dtype
    bs, length, d = f_ref.shape
    h = w1_ref.shape[1]
    thresh = int(rate * (2 ** 32))
    scale = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    use_drop = train and rate > 0

    f2 = f_ref[...].reshape(bs * length, d)
    pre1 = jax.lax.dot_general(
        f2, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...]
    keep1 = _drop_bits((bs * length, h), thresh) if use_drop else None
    h1_in = jnp.where(keep1, pre1 * scale, 0.0) if use_drop else pre1
    h1 = _act_fn(h1_in, act)
    h2 = jax.lax.dot_general(
        h1.astype(cdtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[...]
    keep2 = _drop_bits((bs * length, d), thresh) if use_drop else None
    if use_drop:
        h2 = jnp.where(keep2, h2 * scale, 0.0)

    # masked softmax over the sequence axis (finite -INF fill like
    # masked_softmax: all-invalid rows degrade to uniform weights)
    logits = h2.reshape(bs, length, d)
    valid = mask_ref[...].reshape(bs, length, 1) > 0
    logits = jnp.where(valid, logits, -_NEG_INF)
    mx = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - mx)
    denom = jnp.sum(e, axis=1, keepdims=True)
    sm = e / denom
    keep3 = (_drop_bits((bs, length, d), thresh) if use_drop else None)
    smd = jnp.where(keep3, sm * scale, 0.0) if use_drop else sm
    return f2, pre1, keep1, h1, keep2, sm, keep3, smd


def _fwd_kernel(seed_ref, f_ref, mask_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, out_ref, *, act: str, rate: float, train: bool):
    if train and rate > 0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bs, length, d = f_ref.shape
    f2, _, _, _, _, _, _, smd = _recompute(
        f_ref, mask_ref, w1_ref, b1_ref, w2_ref, b2_ref,
        act=act, rate=rate, train=train)
    f3 = f2.reshape(bs, length, d).astype(jnp.float32)
    out_ref[...] = jnp.sum(f3 * smd, axis=1).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, f_ref, mask_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, dout_ref,
                df_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                *, act: str, rate: float, train: bool):
    i = pl.program_id(0)
    if train and rate > 0:
        pltpu.prng_seed(seed_ref[0] + i)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    cdtype = f_ref.dtype
    bs, length, d = f_ref.shape
    h = w1_ref.shape[1]
    scale = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    use_drop = train and rate > 0

    f2, pre1, keep1, h1, keep2, sm, keep3, smd = _recompute(
        f_ref, mask_ref, w1_ref, b1_ref, w2_ref, b2_ref,
        act=act, rate=rate, train=train)
    f3 = f2.reshape(bs, length, d).astype(jnp.float32)
    dout = dout_ref[...].astype(jnp.float32)  # (bs, d)

    # out = sum_L f * smd
    dsmd = dout[:, None, :] * f3                      # (bs, L, d)
    df = dout[:, None, :] * smd                       # term 1 of df
    dsm = (jnp.where(keep3, dsmd * scale, 0.0) if use_drop else dsmd)
    # softmax bwd over axis=1
    dlogits = sm * (dsm - jnp.sum(dsm * sm, axis=1, keepdims=True))
    valid = mask_ref[...].reshape(bs, length, 1) > 0
    dlogits = jnp.where(valid, dlogits, 0.0)
    dh2 = dlogits.reshape(bs * length, d)
    if use_drop:
        dh2 = jnp.where(keep2, dh2 * scale, 0.0)
    db2_ref[...] += jnp.sum(dh2, axis=0, keepdims=True)
    dh2_c = dh2.astype(cdtype)
    dw2_ref[...] += jax.lax.dot_general(
        h1.astype(cdtype), dh2_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh1 = jax.lax.dot_general(
        dh2_c, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    h1_in = jnp.where(keep1, pre1 * scale, 0.0) if use_drop else pre1
    dpre1 = dh1 * _act_grad(h1_in, act)
    if use_drop:
        dpre1 = jnp.where(keep1, dpre1 * scale, 0.0)
    db1_ref[...] += jnp.sum(dpre1, axis=0, keepdims=True)
    dpre1_c = dpre1.astype(cdtype)
    dw1_ref[...] += jax.lax.dot_general(
        f2.astype(cdtype), dpre1_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    df_mm = jax.lax.dot_general(
        dpre1_c, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    df = df + df_mm.reshape(bs, length, d)
    df_ref[...] = df.astype(df_ref.dtype)


def _specs(bs, length, d, h):
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # seed
        pl.BlockSpec((bs, length, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),                 # f
        pl.BlockSpec((bs, length), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),                 # mask
        pl.BlockSpec((d, h), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),                 # w1
        pl.BlockSpec((h,), lambda i: (0,),
                     memory_space=pltpu.VMEM),                 # b1
        pl.BlockSpec((h, d), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),                 # w2
        pl.BlockSpec((d,), lambda i: (0,),
                     memory_space=pltpu.VMEM),                 # b2
    ]
    return in_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_genpool(f: jnp.ndarray, mask: jnp.ndarray, w1: jnp.ndarray,
                  b1: jnp.ndarray, w2: jnp.ndarray, b2: jnp.ndarray,
                  seed: jnp.ndarray, act: str, rate: float,
                  train: bool, interpret: bool) -> jnp.ndarray:
    """
    pooled = sum_L( f * dropout(softmax_L(mask_fill(
                 dropout(act(dropout(f @ w1 + b1)) @ w2 + b2)))) )

    Args:
        f: (S, L, D) features (compute dtype; bf16 or f32)
        mask: (S, L) validity (True/1 = valid)
        w1: (D, H) f32 flat first projection; b1: (H,) f32
        w2: (H, D) f32 block-diagonal second projection; b2: (D,) f32
        seed: (1,) int32 hardware-PRNG seed (fresh per call per step)
        act: "gelu" | "relu" | "none" (static)
        rate: dropout probability (static); train: apply dropout masks

    Returns (S, D) pooled rows in f.dtype.
    """
    return _fwd_call(f, mask, w1, b1, w2, b2, seed, act, rate, train,
                     interpret)


def _prep(f, mask, w1, w2):
    cdtype = f.dtype
    return (mask.astype(jnp.float32), w1.astype(cdtype),
            w2.astype(cdtype))


def _fwd_call(f, mask, w1, b1, w2, b2, seed, act, rate, train,
              interpret=False):
    s, length, d = f.shape
    h = w1.shape[1]
    mask_f, w1_c, w2_c = _prep(f, mask, w1, w2)
    bs = _pick_block_rows(s, length, d, h, f.dtype.itemsize, bwd=False)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, act=act, rate=rate, train=train),
        out_shape=jax.ShapeDtypeStruct((s, d), f.dtype),
        grid=(s // bs,),
        in_specs=_specs(bs, length, d, h),
        out_specs=pl.BlockSpec((bs, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * s * length * d * h,
            transcendentals=s * length * h,
            bytes_accessed=f.dtype.itemsize * (s * length * d + s * d)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, f, mask_f, w1_c, b1, w2_c, b2)
    return out


def _vjp_fwd(f, mask, w1, b1, w2, b2, seed, act, rate, train,
             interpret):
    out = _fwd_call(f, mask, w1, b1, w2, b2, seed, act, rate, train,
                    interpret)
    return out, (f, mask, w1, b1, w2, b2, seed)


def _vjp_bwd(act, rate, train, interpret, res, dout):
    f, mask, w1, b1, w2, b2, seed = res
    df, dw1, db1, dw2, db2 = _bwd_call(
        f, mask, w1, b1, w2, b2, seed, dout, act, rate, train, interpret)
    return (df, None, dw1, db1, dw2, db2, None)


def _bwd_call(f, mask, w1, b1, w2, b2, seed, dout, act, rate, train,
              interpret=False):
    s, length, d = f.shape
    h = w1.shape[1]
    mask_f, w1_c, w2_c = _prep(f, mask, w1, w2)
    bs = _pick_block_rows(s, length, d, h, f.dtype.itemsize, bwd=True)
    in_specs = _specs(bs, length, d, h) + [
        pl.BlockSpec((bs, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)]                 # dout
    df, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, act=act, rate=rate, train=train),
        out_shape=(jax.ShapeDtypeStruct((s, length, d), f.dtype),
                   jax.ShapeDtypeStruct((d, h), jnp.float32),
                   jax.ShapeDtypeStruct((1, h), jnp.float32),
                   jax.ShapeDtypeStruct((h, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)),
        grid=(s // bs,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((bs, length, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)),
        cost_estimate=pl.CostEstimate(
            flops=10 * s * length * d * h,
            transcendentals=s * length * h,
            bytes_accessed=f.dtype.itemsize * 2 * (s * length * d)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, f, mask_f, w1_c, b1, w2_c, b2, dout)
    return df, dw1.astype(w1.dtype), db1.reshape(h).astype(b1.dtype), \
        dw2.astype(w2.dtype), db2.reshape(d).astype(b2.dtype)


fused_genpool.defvjp(_vjp_fwd, _vjp_bwd)


def fused_genpool_reference(f, mask, w1, b1, w2, b2, act: str):
    """Deterministic (rate=0) unfused XLA math with identical formulas —
    the test oracle; dropout paths are checked statistically instead."""
    cdtype = f.dtype
    s, length, d = f.shape
    f2 = f.reshape(s * length, d)
    pre1 = jax.lax.dot_general(
        f2, w1.astype(cdtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1
    h1 = _act_fn(pre1, act)
    h2 = jax.lax.dot_general(
        h1.astype(cdtype), w2.astype(cdtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2
    logits = h2.reshape(s, length, d)
    valid = mask.reshape(s, length, 1) > 0
    logits = jnp.where(valid, logits, -_NEG_INF)
    mx = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - mx)
    sm = e / jnp.sum(e, axis=1, keepdims=True)
    out = jnp.sum(f.astype(jnp.float32) * sm, axis=1)
    return out.astype(cdtype)


def head_params_to_flat(w1_heads: np.ndarray, b1_heads: np.ndarray,
                        w2_heads: np.ndarray, b2_heads: np.ndarray):
    """(heads, D, dh), (heads, dh), (heads, dh, dho), (heads, dho) ->
    the flat (D, H)/(H,)/(H, D)/(D,) layout the kernel takes — the same
    interleave models/poolers.py GenPool builds."""
    heads, d, dh = w1_heads.shape
    dho = w2_heads.shape[2]
    w1_flat = np.transpose(w1_heads, (1, 0, 2)).reshape(d, heads * dh)
    b1_flat = np.asarray(b1_heads).reshape(-1)
    w2_blk = np.zeros((heads * dh, heads * dho), np.float32)
    for hh in range(heads):
        w2_blk[hh * dh:(hh + 1) * dh, hh * dho:(hh + 1) * dho] = \
            w2_heads[hh]
    b2_flat = np.asarray(b2_heads).reshape(-1)
    return w1_flat, b1_flat, w2_blk, b2_flat
