"""Hardware correctness checks for the two documented negative-result
Pallas kernels on a REAL TPU chip (their CPU-side coverage lives in
tests/test_pallas_gather.py via the interpret machine; the hardware PRNG
has no CPU interpretation — interpret-mode prng_random_bits returns
zeros — so hw_dropout can only be validated here).

Checks:
- ops/pallas_dropout.hw_dropout: keep-rate ~ 1-rate, inverted scaling,
  determinism in seed, different seeds -> different masks, and the
  custom-VJP backward regenerating a bit-identical mask.
- ops/pallas_gather.pallas_gather_rows: element parity vs the XLA gather
  for f32 and bf16 tables.

Exit code 0 iff every check passes. Last verified on v5e (2026-08-17):
all checks PASS.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check_dropout() -> None:
    from coot_videotext_tpu.ops.pallas_dropout import (
        hw_dropout, seed_from_key)

    rate = 0.25
    x = jnp.ones((4096, 512), jnp.float32)
    seed = seed_from_key(jax.random.PRNGKey(3))

    y = np.asarray(jax.jit(hw_dropout, static_argnums=2)(x, seed, rate))
    keep = y != 0
    assert abs(keep.mean() - (1 - rate)) < 0.01, keep.mean()
    assert np.allclose(y[keep], 1.0 / (1 - rate)), "inverted scaling"
    y_again = np.asarray(
        jax.jit(hw_dropout, static_argnums=2)(x, seed, rate))
    assert np.array_equal(y, y_again), "determinism in seed"
    y_other = np.asarray(jax.jit(hw_dropout, static_argnums=2)(
        x, seed_from_key(jax.random.PRNGKey(4)), rate))
    assert not np.array_equal(y, y_other), "seed sensitivity"

    def loss(x):
        return jnp.sum(hw_dropout(x, seed, rate))

    g = np.asarray(jax.jit(jax.grad(loss))(x))
    assert np.array_equal(g != 0, keep), "bwd mask == fwd mask"
    assert np.allclose(g[keep], 1.0 / (1 - rate)), "bwd scaling"
    print("hw_dropout: PASS (keep-rate, scale, determinism, vjp mask)")


def check_gather() -> None:
    from coot_videotext_tpu.ops.pallas_gather import (
        gather_rows_reference, pallas_gather_rows)

    rng = np.random.RandomState(0)
    for dtype, dim in ((jnp.float32, 1024), (jnp.bfloat16, 2048),
                       (jnp.float32, 4096)):
        table = jnp.asarray(rng.randn(512, dim), dtype)
        idx = jnp.asarray(rng.randint(0, 512, 1024), jnp.int32)
        out = pallas_gather_rows(table, idx, rows_per_block=128)
        ref = gather_rows_reference(table, idx)
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(ref, np.float32))
        print(f"pallas_gather_rows: PASS ({np.dtype(dtype).name}, D={dim})")


def main() -> None:
    assert jax.default_backend() == "tpu", (
        f"needs a real TPU, got {jax.default_backend()}")
    check_dropout()
    check_gather()
    print("all pallas kernel hardware checks PASS")


if __name__ == "__main__":
    main()
