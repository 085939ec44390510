"""
Dropout as a Pallas TPU kernel using the on-core hardware PRNG.

Why: the train step draws ~10 dropout masks over ~250M elements total
(attention probs, FFN/sublayer outputs, GenPool internals — reference
transformer_legacy.py:396-608, poolers.py:111-205 apply dropout at each of
these sites). `jax.random.bernoulli` costs ~0.59 ms per 39M-element site on
v5e (the RngBitGenerator HLO is output-bandwidth-bound at ~2 bytes of state
per drawn bit + an f32 convert/compare pass); the step-level ablation puts
total dropout cost at ~6.9 ms of a 43.5 ms step. This kernel seeds the
per-core hardware PRNG (`pltpu.prng_seed`) and draws raw uint32 lanes
(`pltpu.prng_random_bits`) fused with the mask-and-scale, which measures
0.19 ms for the same site (~3x less) and is purely bandwidth-bound.

Backward: dropout's VJP is the SAME masked scale applied to the cotangent.
Instead of materializing/saving the mask, the backward kernel re-seeds the
PRNG with the same per-call seed and regenerates bit-identical masks
(hardware PRNG is deterministic in the seed), so nothing is stored between
forward and backward.

MEASURED NEGATIVE RESULT END-TO-END (kept for the record, like
ops/dropout.py's rematerializing variant): standalone this kernel is ~3x
cheaper than the bernoulli draw (0.19 vs 0.59 ms per site), and it is
correct (keep rate, determinism, fwd/bwd mask identity all verified on
v5e), but wiring it into every model dropout site REGRESSED the yc2 bench
11.3k -> 7.9k clips/s: each opaque pallas_call is a fusion barrier, so the
masks that XLA previously sank into neighboring elementwise fusions (free
bandwidth) became extra full HBM round-trips over the widest activations.
The production `models.layers.Dropout` instead halves the drawn bits
(uint16 threshold compare, XLA-fusable, 11.3k -> 12.2k). Use this kernel
only where a mask is NOT fusable into its surroundings.

Semantics: keep iff bits >= floor(rate * 2^32) — Bernoulli(keep = 1-rate)
up to 2^-32 quantization of the rate (exact for the reference's rates).
The RNG stream differs from `jax.random` (as the reference's torch stream
differs from both); distribution and determinism-in-seed are preserved.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_MAX_BLOCK_ROWS = 4096


def pallas_dropout_available(total_elements: int) -> bool:
    if os.environ.get("COOT_TPU_PALLAS_DROPOUT", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    return total_elements % _LANES == 0 and total_elements >= _LANES * 8


def _pick_rows_per_block(n_rows: int) -> int:
    c = min(n_rows, _MAX_BLOCK_ROWS)
    while n_rows % c:
        c -= 1
    return c


def _mask_scale_kernel(seed_ref, x_ref, o_ref, *, thresh: int,
                       scale: float):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(x_ref.shape)
    keep = bits.astype(jnp.uint32) >= jnp.uint32(thresh)
    o_ref[...] = jnp.where(
        keep, x_ref[...].astype(jnp.float32) * scale, 0.0
    ).astype(o_ref.dtype)


def _mask_scale_call(x2d: jnp.ndarray, seed: jnp.ndarray,
                     rate: float) -> jnp.ndarray:
    n_rows, n_cols = x2d.shape
    blk = _pick_rows_per_block(n_rows)
    return pl.pallas_call(
        functools.partial(_mask_scale_kernel,
                          thresh=int(rate * (2 ** 32)),
                          scale=1.0 / (1.0 - rate)),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        grid=(n_rows // blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((blk, n_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, n_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(seed, x2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hw_dropout(x: jnp.ndarray, seed: jnp.ndarray,
               rate: float) -> jnp.ndarray:
    """
    Dropout via the TPU hardware PRNG.

    Args:
        x: any shape with total elements divisible by 128
        seed: (1,) int32 — one fresh value per call site per step
        rate: static drop probability in (0, 1)
    """
    return _apply(x, seed, rate)


def _apply(x, seed, rate):
    shape = x.shape
    x2d = x.reshape(-1, _LANES)
    return _mask_scale_call(x2d, seed, rate).reshape(shape)


def _fwd(x, seed, rate):
    return _apply(x, seed, rate), seed


def _bwd(rate, seed, g):
    # same seed + same grid layout => bit-identical masks
    return _apply(g, seed, rate), None


hw_dropout.defvjp(_fwd, _bwd)


def seed_from_key(key: jax.Array) -> jnp.ndarray:
    """Derive a (1,) int32 kernel seed from a JAX PRNG key by XOR-folding
    every key word (word 0 alone is constant for typical keys)."""
    data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    seed = data[0]
    for i in range(1, data.shape[0]):
        seed = seed ^ (data[i] * jnp.uint32(2654435761 + i))
    return seed[None].astype(jnp.int32)
