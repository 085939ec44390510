"""
Mask-semantics property tests for self- and cross-attention (models reference
tests_nntrainer/test_transformers.py:33-84): perturbing a masked input
position must not change any valid output position; perturbing a valid
position may change all valid outputs.
"""

import numpy as np

import jax
import jax.numpy as jnp

from coot_videotext_tpu.models.attention import (
    TransformerDecoder, TransformerEncoder)
from coot_videotext_tpu.models.configs import TransformerEncoderConfig


def _enc_cfg(dim=16, layers=2, heads=4):
    return TransformerEncoderConfig({
        "hidden_dim": dim, "num_layers": layers, "num_heads": heads,
        "pointwise_ff_dim": dim, "activation": "gelu", "dropout": 0.0,
        "norm": "layernorm_coot"})


def test_encoder_mask_semantics():
    cfg = _enc_cfg()
    b, l, d = 2, 6, 16
    rng = np.random.RandomState(0)
    x = rng.randn(b, l, d).astype(np.float32)
    mask = np.ones((b, l), bool)
    mask[:, 4:] = False  # last two positions padded

    enc = TransformerEncoder(cfg=cfg)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x),
                      jnp.asarray(mask))
    out1 = np.asarray(enc.apply(params, jnp.asarray(x), jnp.asarray(mask)))

    # perturb a PADDED position -> valid outputs unchanged
    x2 = x.copy()
    x2[:, 5, :] += 100.0
    out2 = np.asarray(enc.apply(params, jnp.asarray(x2), jnp.asarray(mask)))
    np.testing.assert_allclose(out1[:, :4], out2[:, :4], atol=1e-5)

    # perturb a VALID position -> valid outputs change (the effect is small
    # because truncnorm(0.01) init makes attention nearly uniform)
    x3 = x.copy()
    x3[:, 1, :] += 10.0
    out3 = np.asarray(enc.apply(params, jnp.asarray(x3), jnp.asarray(mask)))
    assert np.abs(out3[:, :4] - out1[:, :4]).max() > 1e-4


def test_decoder_cross_attention_mask_semantics():
    cfg = _enc_cfg(layers=1)
    b, lq, lk, d = 2, 3, 7, 16
    rng = np.random.RandomState(1)
    q = rng.randn(b, lq, d).astype(np.float32)
    kv = rng.randn(b, lk, d).astype(np.float32)
    mask = np.ones((b, lk), bool)
    mask[:, 5:] = False

    dec = TransformerDecoder(cfg=cfg)
    params = dec.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(kv),
                      jnp.asarray(mask))
    out1 = np.asarray(dec.apply(params, jnp.asarray(q), jnp.asarray(kv),
                                jnp.asarray(mask)))
    # perturb masked key -> no output change
    kv2 = kv.copy()
    kv2[:, 6, :] += 50.0
    out2 = np.asarray(dec.apply(params, jnp.asarray(q), jnp.asarray(kv2),
                                jnp.asarray(mask)))
    np.testing.assert_allclose(out1, out2, atol=1e-5)
    # perturb valid key -> output changes
    kv3 = kv.copy()
    kv3[:, 0, :] += 1.0
    out3 = np.asarray(dec.apply(params, jnp.asarray(q), jnp.asarray(kv3),
                                jnp.asarray(mask)))
    assert np.abs(out3 - out1).max() > 1e-4


def test_genpool_mask_semantics():
    from coot_videotext_tpu.models.configs import PoolerConfig
    from coot_videotext_tpu.models.poolers import MultiGenPool
    cfg = PoolerConfig({"name": "atn", "hidden_dim": 32, "num_heads": 2,
                        "num_layers": 1, "dropout": 0.0,
                        "activation": "gelu"})
    b, l, d = 2, 5, 16
    rng = np.random.RandomState(2)
    x = rng.randn(b, l, d).astype(np.float32)
    mask = np.ones((b, l), bool)
    mask[:, 3:] = False
    lengths = jnp.asarray(mask.sum(-1))

    pool = MultiGenPool(cfg=cfg, d_input=d)
    params = pool.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(mask), lengths)
    out1 = np.asarray(pool.apply(params, jnp.asarray(x), jnp.asarray(mask),
                                 lengths))
    assert out1.shape == (b, d)
    x2 = x.copy()
    x2[:, 4, :] += 100.0
    out2 = np.asarray(pool.apply(params, jnp.asarray(x2), jnp.asarray(mask),
                                 lengths))
    np.testing.assert_allclose(out1, out2, atol=1e-5)
