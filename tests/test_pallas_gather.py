"""
Parity tests for the scalar-prefetch DMA gather kernel
(ops/pallas_gather.py — a documented negative-result kernel kept as the
DMA reference pattern; see its module docstring).

Runs the REAL kernel logic under the pallas TPU interpret machine
(pltpu.InterpretParams), which simulates the async row DMAs and scalar
prefetch on CPU, and checks element parity against the XLA gather.
tools/check_pallas_kernels_tpu.py runs the same checks compiled on a
real chip.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from coot_videotext_tpu.ops.pallas_gather import (
    gather_rows_reference, pallas_gather_rows)


@pytest.mark.parametrize("dtype,dim", [(jnp.float32, 1024),
                                       (jnp.bfloat16, 2048)])
def test_gather_rows_parity_interpret(dtype, dim):
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(96, dim), dtype)
    idx = jnp.asarray(rng.randint(0, 96, 48), jnp.int32)
    out = pallas_gather_rows(table, idx, rows_per_block=16,
                             interpret=True)
    ref = gather_rows_reference(table, idx)
    assert out.dtype == ref.dtype
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_gather_rows_block_fallback_and_repeats():
    """rows_per_block not dividing N halves down to a divisor; repeated
    and boundary indices (0, T-1) gather correctly."""
    rng = np.random.RandomState(1)
    table = jnp.asarray(rng.randn(33, 1024), jnp.float32)
    idx = jnp.asarray([0, 32, 7, 7, 7, 0], jnp.int32)
    out = pallas_gather_rows(table, idx, rows_per_block=4,
                             interpret=True)  # 6 % 4 != 0 -> blocks of 2
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(table)[np.asarray(idx)])


def test_gather_rows_misaligned_dim_rejected():
    table = jnp.zeros((8, 1000), jnp.float32)  # 1000 % 1024 != 0
    idx = jnp.zeros((4,), jnp.int32)
    with pytest.raises(AssertionError):
        pallas_gather_rows(table, idx, interpret=True)
