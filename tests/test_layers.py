"""Layer numerics: COOT layernorm vs torch formula, sincos PE, MLP shapes,
truncnorm init bounds."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coot_videotext_tpu.models.configs import (
    ActivationConfig, MLPConfig, NormalizationConfig)
from coot_videotext_tpu.models.layers import (
    MLP, CootLayerNorm, make_activation, sincos_positional_encoding)


def test_coot_layernorm_matches_torch_formula():
    """gain*(x-mean)/(std_bessel+eps)+bias, reference normalizations.py:98."""
    rng = np.random.RandomState(0)
    x = rng.randn(4, 7, 16).astype(np.float32)
    ln = CootLayerNorm(eps=1e-6)
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = ln.apply(params, jnp.asarray(x))
    mean = x.mean(-1, keepdims=True)
    std = x.std(-1, ddof=1, keepdims=True)  # Bessel-corrected like torch .std()
    expected = (x - mean) / (std + 1e-6)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_coot_layernorm_large_offset_accuracy():
    """Rows with mean^2 >> var: the naive single-pass s2 - mean*s1
    catastrophically cancels in f32 (offset 1e3, std 1e-2 -> relative
    error ~ dim * 1e6 * eps_f32 / var >> 1); the shifted single-pass
    stats must match a float64 two-pass reference."""
    rng = np.random.RandomState(2)
    base = rng.randn(4, 4096).astype(np.float64) * 1e-2
    x = (base + 1e3).astype(np.float32)
    ln = CootLayerNorm(eps=1e-6)
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(ln.apply(params, jnp.asarray(x)))
    x64 = x.astype(np.float64)
    mean = x64.mean(-1, keepdims=True)
    std = x64.std(-1, ddof=1, keepdims=True)
    expected = (x64 - mean) / (std + 1e-6)
    np.testing.assert_allclose(out, expected, atol=5e-3)
    # and the gradient stays finite + sane
    g = jax.grad(lambda x: jnp.sum(jnp.square(ln.apply(params, x))))(
        jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()


def test_coot_layernorm_differs_from_standard():
    """It must NOT equal biased-variance layernorm (parity-relevant)."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 8).astype(np.float32)
    ln = CootLayerNorm(eps=1e-6)
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(ln.apply(params, jnp.asarray(x)))
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    standard = (x - mean) / np.sqrt(var + 1e-6)
    assert np.abs(out - standard).max() > 1e-3


def test_coot_layernorm_zero_variance_grad_finite():
    """Constant (e.g. all-zero) rows must have finite gradients: zeroed
    padded clip/sentence slots feed the global net's input norm, and a NaN
    there poisons the shared local-net parameter gradients via 0 * NaN
    even when the row's output cotangent is exactly zero (regression:
    training went NaN within one epoch)."""
    ln = CootLayerNorm(eps=1e-6)
    x = jnp.zeros((3, 8))
    params = ln.init(jax.random.PRNGKey(0), x)

    def masked_loss(x):
        # downstream mask multiplies the padded row's output by zero —
        # exactly the situation in the retrieval hierarchy
        return jnp.sum(ln.apply(params, x) * 0.0)

    g = jax.grad(masked_loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    # forward value at zero variance unchanged: (x - mean) / (0 + eps) = 0
    np.testing.assert_allclose(np.asarray(ln.apply(params, x)), 0.0)
    # and gradients at a mix of constant and non-constant rows stay finite
    x2 = jnp.concatenate([jnp.zeros((1, 8)), jnp.ones((1, 8)),
                          jnp.arange(8, dtype=jnp.float32)[None]], axis=0)
    g2 = jax.grad(lambda x: jnp.sum(ln.apply(params, x) ** 2))(x2)
    assert np.isfinite(np.asarray(g2)).all()


def test_sincos_positional_encoding_reference_variant():
    """pe[:,0::2]=sin(pos/div[0::2]), pe[:,1::2]=cos(pos/div[1::2]),
    div=10000**(2*arange(dim)/dim) (reference encoder.py:84-90)."""
    dim, max_len = 10, 20
    pe = np.asarray(sincos_positional_encoding(max_len, dim))
    pos = np.arange(max_len)[:, None].astype(np.float64)
    dimension = np.arange(dim).astype(np.float64)
    div = 10000.0 ** (2 * dimension / dim)
    expected = np.zeros((max_len, dim))
    expected[:, 0::2] = np.sin(pos / div[0::2])
    expected[:, 1::2] = np.cos(pos / div[1::2])
    np.testing.assert_allclose(pe, expected, atol=1e-5)


def test_gelu_exact():
    """gelu must be erf-based (torch default), not tanh-approximate."""
    act = make_activation(ActivationConfig("gelu"))
    x = jnp.asarray([-1.0, -0.1, 0.0, 0.5, 2.0])
    from scipy.stats import norm
    expected = np.asarray(x) * norm.cdf(np.asarray(x))
    np.testing.assert_allclose(np.asarray(act(x)), expected, atol=1e-6)


def _mlp_cfg(**over):
    base = dict(output_dim=8, num_layers=1, hidden_dim=0,
                activation_middle="none", activation_output="gelu",
                dropout_middle=0, dropout_output=0, norm_middle="none",
                norm_output="none", residual="none")
    base.update(over)
    return MLPConfig(base)


def test_mlp_shapes_and_residual():
    x = jnp.ones((3, 5, 8))
    mlp = MLP(cfg=_mlp_cfg(residual="passthrough"))
    params = mlp.init(jax.random.PRNGKey(0), x)
    out = mlp.apply(params, x)
    assert out.shape == (3, 5, 8)

    mlp2 = MLP(cfg=_mlp_cfg(num_layers=3, hidden_dim=16, output_dim=4,
                            activation_middle="relu", residual="linear"))
    params2 = mlp2.init(jax.random.PRNGKey(0), x)
    out2 = mlp2.apply(params2, x)
    assert out2.shape == (3, 5, 4)
    # 3 fc layers + 1 residual fc
    assert len(params2["params"]) == 4


def test_truncnorm_init_bounds():
    mlp = MLP(cfg=_mlp_cfg(), init_type="truncnorm", init_std=0.01)
    params = mlp.init(jax.random.PRNGKey(0), jnp.ones((2, 8)))
    kernel = np.asarray(params["params"]["fc_0"]["kernel"])
    assert np.abs(kernel).max() <= 0.02 + 1e-6  # 2 sigma truncation
    assert kernel.std() == pytest.approx(0.01, rel=0.4)


def test_dropout_remat_bwd_mask_matches_fwd():
    """ops/dropout.py (documented negative result, kept as a reference
    pattern): the regenerated backward mask must be bit-identical to the
    forward mask — grad == d(mask * x / q)/dx == mask / q."""
    from coot_videotext_tpu.ops.dropout import dropout_remat
    key = jax.random.PRNGKey(7)
    x = jnp.ones((64, 33))
    rate = 0.3
    y, vjp = jax.vjp(lambda x: dropout_remat(x, key, rate), x)
    (gx,) = vjp(jnp.ones_like(x))
    q = 1.0 - rate
    np.testing.assert_allclose(np.asarray(y) * 0 + np.asarray(gx),
                               np.asarray(y), rtol=1e-6)
    kept = float((np.asarray(y) > 0).mean())
    assert abs(kept - q) < 0.1


def test_dropout_module_distribution_and_grad():
    """models.layers.Dropout: keep-rate ~ 1-rate, inverted scaling, the
    backward mask equals the forward mask, and same key -> same mask."""
    from coot_videotext_tpu.models.layers import Dropout

    rate = 0.25
    mod = Dropout(rate=rate)
    x = jnp.ones((64, 128), jnp.float32)
    key = jax.random.PRNGKey(3)

    def run(k):
        return mod.apply({}, x, deterministic=False,
                         rngs={"dropout": k})

    y = np.asarray(run(key))
    keep = y != 0
    assert abs(keep.mean() - (1 - rate)) < 0.02
    assert np.allclose(y[keep], 1.0 / (1 - rate))
    assert np.array_equal(np.asarray(run(key)), y)  # deterministic in key
    y2 = np.asarray(run(jax.random.PRNGKey(4)))
    assert not np.array_equal(y2, y)

    g = jax.grad(lambda x: jnp.sum(mod.apply(
        {}, x, deterministic=False, rngs={"dropout": key})))(x)
    g = np.asarray(g)
    assert np.array_equal(g != 0, keep)  # same mask in backward
    assert np.allclose(g[keep], 1.0 / (1 - rate))

    y_det = np.asarray(mod.apply({}, x, deterministic=True))
    assert np.array_equal(y_det, np.asarray(x))


def test_dropout_module_edge_cases():
    """Sub-quantum rates (< 2^-16) still drop at the smallest
    representable probability instead of silently disabling, and an
    unspecified deterministic raises (even under python -O)."""
    from coot_videotext_tpu.models.layers import Dropout

    x = jnp.ones((512, 512), jnp.float32)
    tiny = 1e-7  # round(rate * 65536) == 0 -> clamped to 1
    y = np.asarray(Dropout(rate=tiny).apply(
        {}, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(0)}))
    drop_frac = float((y == 0).mean())
    # clamped threshold of 1/65536 ~ 1.5e-5: expect ~4 drops in 262k
    assert 0 < drop_frac < 1e-4

    with pytest.raises(ValueError, match="deterministic"):
        Dropout(rate=0.1).apply({}, x)


def test_temporal_avg_pool_batchmax_row_semantics():
    """avg_special parity rule (round 4): the pool must sum exactly the
    rows the reference's batch-max padding would contain — garbage rows
    beyond max(lengths) (which only exist under our bucketed static
    shapes) must NOT enter the average, while garbage rows BELOW
    batch-max (the reference's own quirk) must."""
    import jax.numpy as jnp
    import numpy as np
    from coot_videotext_tpu.models.poolers import TemporalAvgPool

    rng = np.random.RandomState(0)
    feats16 = rng.randn(3, 16, 8).astype(np.float32)
    lengths = np.array([2, 5, 3], np.int32)  # batch max 5
    mask = np.arange(16)[None, :] < lengths[:, None]

    pool = TemporalAvgPool()
    out16 = pool.apply({}, jnp.asarray(feats16), jnp.asarray(mask),
                       jnp.asarray(lengths))
    # bucket further to 24 slots with NEW garbage -> output must not move
    feats24 = np.concatenate(
        [feats16, rng.randn(3, 8, 8).astype(np.float32)], axis=1)
    mask24 = np.arange(24)[None, :] < lengths[:, None]
    out24 = pool.apply({}, jnp.asarray(feats24), jnp.asarray(mask24),
                       jnp.asarray(lengths))
    np.testing.assert_array_equal(np.asarray(out16), np.asarray(out24))
    # reference semantics: rows < batch-max are summed even when padded
    expect = feats16[:, :5].sum(1) / np.maximum(lengths, 1)[:, None]
    np.testing.assert_allclose(np.asarray(out16), expect, rtol=1e-6)
