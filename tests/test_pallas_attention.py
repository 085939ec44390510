"""
Pallas fused masked-attention kernel: numerics vs the XLA reference path.
On the CPU test backend the kernel runs in the pallas interpreter
(force_tpu_interpret_mode); on a real TPU it compiles via Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from coot_videotext_tpu.ops.pallas_attention import (
    masked_attention_reference, pallas_masked_attention)


@pytest.mark.parametrize("shape", [(16, 16, 16, 48), (8, 24, 40, 64)])
def test_pallas_attention_matches_xla(shape):
    n, lq, lk, dh = shape
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(n, lq, dh), jnp.float32)
    k = jnp.asarray(rng.randn(n, lk, dh), jnp.float32)
    v = jnp.asarray(rng.randn(n, lk, dh), jnp.float32)
    mask = jnp.asarray(rng.rand(n, lq, lk) > 0.3)
    mask = mask.at[:, :, 0].set(True)  # at least one valid key
    scale = 1.0 / dh ** 0.5

    with pltpu.force_tpu_interpret_mode():
        out_p = pallas_masked_attention(q, k, v, mask, scale)
    out_x = masked_attention_reference(q, k, v, mask, scale)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-4, atol=2e-4)

    def loss_p(q, k, v):
        return (pallas_masked_attention(q, k, v, mask, scale)
                ** 2).sum()

    def loss_x(q, k, v):
        return (masked_attention_reference(q, k, v, mask, scale)
                ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_mha_pallas_flag_matches_xla_path():
    """MultiHeadAttention(use_pallas) equals the default path (interpret
    mode; on CPU use_pallas=True is a no-op so compare kernels directly
    through the module plumbing shapes)."""
    from coot_videotext_tpu.models.attention import MultiHeadAttention
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 24, 64), jnp.float32)
    mask = jnp.asarray(rng.rand(4, 24, 24) > 0.2)
    mask = mask.at[:, :, 0].set(True)
    mha = MultiHeadAttention(num_heads=4, d_model=64)
    params = mha.init(jax.random.PRNGKey(0), x, x, x, mask)
    out = mha.apply(params, x, x, x, mask)
    # forcing use_pallas on the CPU backend falls back to XLA (no-op)
    mha_p = MultiHeadAttention(num_heads=4, d_model=64, use_pallas=True)
    out_p = mha_p.apply(params, x, x, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_p),
                               rtol=1e-5, atol=1e-5)
