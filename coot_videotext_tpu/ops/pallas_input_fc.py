"""
Fused input projection: CootLayerNorm -> Dense -> (gelu) in ONE Pallas
TPU kernel, with a recompute-based custom VJP.

Why: every COOT local network first normalizes the raw feature rows
(4096-d video / 1536-d text; reference transformer_legacy.py:200-214 applies
`layernorm_coot` then the input FC) and projects them to d=384. In XLA this
costs several HBM round-trips over the widest tensors in the whole model:
the norm's reduction+normalize pass (~3 ms standalone on the bench shapes),
the normalized activation re-read by the matmul, and the same activation
saved as a forward->backward residual. Fused, the kernel reads each input
row ONCE, keeps statistics + normalized values in VMEM, feeds the MXU
in-register and writes only the (S, 384) projection (plus the (S, 384)
pre-activation residual for backward) — HBM traffic drops from ~5 passes
over (S, 4096) to one.

MEASURED END-TO-END: a wash on the yc2 train bench (12.25k clips/s fused
vs 12.22k unfused) — the step-level ablation shows the input-side passes
overlap other work in XLA's schedule, so shrinking them does not shorten
the critical path (model fwd+bwd at the attention/pooler shapes dominates).
Kept enabled: it reduces HBM pressure at zero measured cost, wins on
memory-bound variants (bigger batches / wider features), and its VMEM
residency is exactly what the scaling-relevant larger configs need.

Backward recomputes the norm from x in VMEM (x is re-read once) and emits
dW, db, dgain, dbias. **The input cotangent is NOT computed** (returned as
zeros): this kernel is only for the input projection, whose features come
from the data pipeline (HBM feature-store gathers + augmentation noise) and
are never differentiated. models/transformer.py gates the fused path on
exactly that structural position (plus TPU backend + layernorm_coot +
single-layer FC with gelu/none activation); every other configuration takes
the unfused XLA path.

Numerics: statistics and normalization in f32 (sum / sum-of-squares
single-pass, Bessel ddof=1 variance, eps on std, zero-variance guard —
identical formulas to models/layers.py CootLayerNorm); the normalized rows
are rounded to the compute dtype before the MXU exactly like the unfused
path rounds the norm output; the matmul accumulates f32. gelu is the exact
erf form. Off-TPU and in any non-matching configuration the module falls
back to the unfused ops, which the parity suite pins to torch golden values.
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

_SQRT2 = float(np.sqrt(2.0))
_INV_SQRT2PI = float(1.0 / np.sqrt(2.0 * np.pi))


def fused_input_fc_available(din: int, dout: int,
                             itemsize: int = 2) -> bool:
    """True when the kernel supports (din, dout) at the given compute
    itemsize (x/w bytes: 2 for bf16, 4 for f32) — lane alignment AND the
    VMEM fit of the backward kernel at >= 32 rows per block; callers fall
    back to the unfused XLA path otherwise."""
    if os.environ.get("COOT_TPU_FUSED_INPUT_FC", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    if din % 128 != 0 or dout % 128 != 0:
        return False
    fixed, per_row = _bwd_footprint(din, dout, itemsize)
    return fixed + 32 * per_row <= _VMEM_BUDGET


def _erf(z):
    """erf via Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7 — far below
    bf16 resolution); Mosaic has no erf lowering, exp it has."""
    s = jnp.sign(z)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x / _SQRT2))


def _gelu_grad(x):
    return (0.5 * (1.0 + _erf(x / _SQRT2))
            + x * jnp.exp(-0.5 * x * x) * _INV_SQRT2PI)


def _norm_rows(x32, gain, bias, eps: float):
    """CootLayerNorm over the last axis; returns (xhat, xn) in f32.
    Shifted single-pass stats (mirrors models/layers.py CootLayerNorm):
    subtracting the per-row first element before accumulating removes the
    s2 - mean*s1 cancellation for large-offset rows at no extra pass."""
    din = x32.shape[-1]
    c = x32[..., :1]
    xc = x32 - c
    s1 = jnp.sum(xc, axis=-1, keepdims=True)
    s2 = jnp.sum(xc * xc, axis=-1, keepdims=True)
    mean_c = s1 / din
    var = jnp.maximum(s2 - mean_c * s1, 0.0) / max(din - 1, 1)
    mean = c + mean_c
    var_pos = var > 0.0
    std = jnp.where(var_pos, jnp.sqrt(jnp.where(var_pos, var, 1.0)), 0.0)
    xhat = (x32 - mean) / (std + eps)
    return xhat, gain * xhat + bias


# scoped-vmem is 16M; the footprint models below include double
# buffering honestly, so only a small safety margin is needed (14M cost
# ~4% bench throughput by halving the bwd block rows at bf16/din=4096)
_VMEM_BUDGET = 15 * 1024 * 1024


def _bwd_footprint(din: int, dout: int, itemsize: int):
    """(fixed bytes, bytes per block row) of the backward kernel: the
    weight tile cast to the compute dtype + the resident f32 dW output
    block (which doubles as the accumulator); per row the double-buffered
    x block, the f32 upcast/xhat/dxn temps, the compute-dtype xn copy,
    and the (dout)-wide double-buffered pre/dy blocks + dpre temps."""
    fixed = itemsize * din * dout + 4 * din * dout
    per_row = ((2 * itemsize + 4 + 4 + itemsize + 4) * din
               + (8 + 2 * itemsize + 4 + itemsize) * dout)
    return fixed, per_row


def _pick_block_rows(s: int, din: int, dout: int, itemsize: int,
                     bwd: bool) -> int:
    """Rows per grid step within the VMEM budget. Forward holds the x
    block (+f32 temps) and the weight tile; backward additionally holds
    the f32 dW accumulator, the dxn block and the recomputed xhat.
    fused_input_fc_available() guarantees >= 32 rows fit for backward."""
    if bwd:
        fixed, bytes_per_row = _bwd_footprint(din, dout, itemsize)
    else:
        fixed = itemsize * din * dout
        bytes_per_row = (4 + 2 * itemsize) * din + 16 * dout
    bs = (_VMEM_BUDGET - fixed) // max(bytes_per_row, 1)
    # min 32 rows: stays above the bf16 (16, 128) tile and keeps the MXU
    # contraction dim workable
    bs = max(32, min(1024, bs))
    bs = 1 << int(np.floor(np.log2(bs)))
    while s % bs:
        bs //= 2
    return max(bs, 1)


def _fwd_kernel(x_ref, gain_ref, bias_ref, w_ref, b_ref, y_ref,
                pre_ref=None, *, eps: float, act: str):
    x32 = x_ref[...].astype(jnp.float32)
    _, xn = _norm_rows(x32, gain_ref[...], bias_ref[...], eps)
    xn_c = xn.astype(w_ref.dtype)
    pre = jax.lax.dot_general(
        xn_c, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[...]
    if pre_ref is not None:  # backward needs the pre-activation residual
        pre_ref[...] = pre
    y = _gelu(pre) if act == "gelu" else pre
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, gain_ref, bias_ref, w_ref, pre_ref, dy_ref,
                dw_ref, db_ref, dgain_ref, dbias_ref,
                *, eps: float, act: str):
    # the grad outputs use constant index_maps, so their VMEM blocks stay
    # resident across the sequential grid and serve as the accumulators
    # directly — a separate f32 dW scratch doubled the largest allocation
    # and blew the 16M scoped-vmem limit at bf16/din=4096 (the AB-run
    # OOM); accumulate in-place instead
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dgain_ref[...] = jnp.zeros_like(dgain_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    x32 = x_ref[...].astype(jnp.float32)
    xhat, xn = _norm_rows(x32, gain_ref[...], bias_ref[...], eps)
    dy = dy_ref[...].astype(jnp.float32)
    if act == "gelu":
        dpre = dy * _gelu_grad(pre_ref[...])
    else:
        dpre = dy
    dpre_c = dpre.astype(w_ref.dtype)
    xn_c = xn.astype(w_ref.dtype)
    # dW += xn^T dpre ; db += sum(dpre)
    dw_ref[...] += jax.lax.dot_general(
        xn_c, dpre_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[...] += jnp.sum(dpre, axis=0, keepdims=True)
    # dxn = dpre W^T ; dgain += sum(dxn * xhat) ; dbias += sum(dxn)
    dxn = jax.lax.dot_general(
        dpre_c, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dgain_ref[...] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dbias_ref[...] += jnp.sum(dxn, axis=0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_input_fc(x: jnp.ndarray, gain: jnp.ndarray, bias: jnp.ndarray,
                   w: jnp.ndarray, b: jnp.ndarray, eps: float,
                   act: str) -> jnp.ndarray:
    """
    y = act(W @ cootnorm(x; gain, bias) + b), fused.

    Args:
        x: (S, Din) features — NON-DIFFERENTIABLE data (dx returned as 0)
        gain/bias: (Din,) f32 CootLayerNorm parameters
        w: (Din, Dout) f32 Dense kernel; b: (Dout,) f32 Dense bias
        eps: norm epsilon (static); act: "gelu" | "none" (static)

    Returns (S, Dout) in x.dtype.
    """
    # primal-only call (eval / no grad): skip the pre-activation residual
    # output entirely - pallas outputs are not DCE'd by XLA
    return _fwd_call(x, gain, bias, w, b, eps, act, need_pre=False)[0]


def _fwd_call(x, gain, bias, w, b, eps, act, need_pre=True,
              interpret=False):
    s, din = x.shape
    dout = w.shape[1]
    bs = _pick_block_rows(s, din, dout, x.dtype.itemsize, bwd=False)
    w_c = w.astype(x.dtype)
    grid = s // bs
    if need_pre:
        out_shape = (jax.ShapeDtypeStruct((s, dout), x.dtype),
                     jax.ShapeDtypeStruct((s, dout), jnp.float32))
    else:
        out_shape = (jax.ShapeDtypeStruct((s, dout), x.dtype),)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, act=act),
        out_shape=out_shape,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((bs, din), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din, dout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dout,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((bs, dout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in out_shape),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * din * dout + 6 * s * din,
            transcendentals=s * dout,
            bytes_accessed=(x.dtype.itemsize * s * din
                            + 4 * 2 * s * dout)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, gain, bias, w_c, b)
    return out if need_pre else (out[0], None)


def _vjp_fwd(x, gain, bias, w, b, eps, act):
    y, pre = _fwd_call(x, gain, bias, w, b, eps, act)
    return y, (x, gain, bias, w, pre)


def _vjp_bwd(eps, act, res, dy):
    x, gain, bias, w, pre = res
    return _bwd_call(x, gain, bias, w, pre, dy, eps, act)


def _bwd_call(x, gain, bias, w, pre, dy, eps, act, interpret=False):
    s, din = x.shape
    dout = w.shape[1]
    bs = _pick_block_rows(s, din, dout, x.dtype.itemsize, bwd=True)
    w_c = w.astype(x.dtype)
    grid = s // bs
    dw, db, dgain, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, act=act),
        out_shape=(jax.ShapeDtypeStruct((din, dout), jnp.float32),
                   jax.ShapeDtypeStruct((1, dout), jnp.float32),
                   jax.ShapeDtypeStruct((1, din), jnp.float32),
                   jax.ShapeDtypeStruct((1, din), jnp.float32)),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((bs, din), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din, dout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, dout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, dout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((din, dout), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, dout), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, din), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, din), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        cost_estimate=pl.CostEstimate(
            flops=4 * s * din * dout + 10 * s * din,
            transcendentals=s * dout,
            bytes_accessed=(x.dtype.itemsize * s * din
                            + 4 * 2 * s * dout)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, gain, bias, w_c, pre, dy)
    return (jnp.zeros_like(x), dgain.reshape(din), dbias.reshape(din),
            dw, db.reshape(dout))


fused_input_fc.defvjp(_vjp_fwd, _vjp_bwd)


def fused_input_fc_reference(x, gain, bias, w, b, eps, act):
    """Unfused XLA reference with identical numerics (tests/benchmarks)."""
    x32 = x.astype(jnp.float32)
    _, xn = _norm_rows(x32, gain, bias, eps)
    xn_c = xn.astype(x.dtype)
    pre = jax.lax.dot_general(
        xn_c, w.astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b
    y = _gelu(pre) if act == "gelu" else pre
    return y.astype(x.dtype)
