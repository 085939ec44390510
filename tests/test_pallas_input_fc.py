"""
Fused input-projection op (ops/pallas_input_fc.py) tests.

The conftest pins tests to the CPU backend, where the compiled pallas
kernel is unavailable — there the fwd/bwd kernel tests run the REAL
kernel logic under the pallas TPU interpret machine (like
test_pallas_gather.py), so nothing in this file ever skips; on a real
chip the same tests compile. Reference-vs-module numerics, structural
gating, and parameter-tree identity are covered backend-independently.
"""

import numpy as np

import jax
import jax.numpy as jnp

from coot_videotext_tpu.ops.pallas_input_fc import (
    _erf, fused_input_fc_reference)


def _unfused_module_path(x, gain, bias, w, b, eps):
    """CootLayerNorm -> Dense -> gelu exactly as the unfused modules
    compose (models/layers.py CootLayerNorm + MLP single layer)."""
    from coot_videotext_tpu.models.layers import CootLayerNorm
    norm = CootLayerNorm(eps=eps, dtype=x.dtype)
    xn = norm.apply({"params": {"gain": gain, "bias": bias}}, x)
    pre = (xn @ w.astype(x.dtype)).astype(jnp.float32) + b
    return jax.nn.gelu(pre, approximate=False).astype(x.dtype)


def test_reference_matches_unfused_modules():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 256), jnp.float32)
    gain = jnp.asarray(rng.rand(256) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(256) * 0.1, jnp.float32)
    w = jnp.asarray(rng.randn(256, 128) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(128) * 0.01, jnp.float32)
    y_ref = fused_input_fc_reference(x, gain, bias, w, b, 1e-6, "gelu")
    y_mod = _unfused_module_path(x, gain, bias, w, b, 1e-6)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_mod),
                               atol=2e-5, rtol=2e-5)


def test_erf_poly_accuracy():
    z = jnp.linspace(-6.0, 6.0, 4001)
    err = np.abs(np.asarray(_erf(z)) - np.asarray(jax.lax.erf(z)))
    assert err.max() < 1e-6  # A&S bound 1.5e-7 + f32 eval rounding


def test_fused_gating_structural():
    """The fused path must only engage for the exact input-projection
    shape it implements (and never on CPU)."""
    from coot_videotext_tpu.models.transformer import CootTransformer
    from coot_videotext_tpu.models.configs import TransformerConfig
    from tests.helpers import small_net_config

    cfg = TransformerConfig(dict(small_net_config(128, 64),
                                 name="transformer"))
    net = CootTransformer(cfg=cfg, dtype=jnp.float32)
    # on the CPU test backend the kernel is never available
    assert net._fused_input_act(128) is None

    # structural rejections, independent of backend
    cfg2 = TransformerConfig(dict(small_net_config(128, 64),
                                  name="transformer"))
    cfg2.norm_input = "none"
    assert CootTransformer(cfg=cfg2)._fused_input_act(128) is None
    cfg3 = TransformerConfig(dict(small_net_config(128, 64),
                                  name="transformer"))
    cfg3.input_fc_config.residual = "passthrough"
    assert CootTransformer(cfg=cfg3)._fused_input_act(128) is None


def test_param_tree_paths_match_unfused():
    """The parameter-only stand-in modules must produce the identical
    pytree paths (CootLayerNorm_0/{gain,bias}, input_fc/fc_0/{kernel,bias})
    AND identical initial values as the unfused path, so checkpoints and
    the torch converter are path-independent of the fused toggle."""
    from coot_videotext_tpu.models.transformer import (
        _CootNormParams, _InputFCParams, CootTransformer)
    from coot_videotext_tpu.models.configs import TransformerConfig
    from flax import linen as nn
    from tests.helpers import small_net_config

    cfg = TransformerConfig(dict(small_net_config(32, 64),
                                 name="transformer"))
    net = CootTransformer(cfg=cfg, dtype=jnp.float32)
    x = jnp.zeros((2, 5, 48))
    mask = jnp.ones((2, 5), bool)
    lens = jnp.full((2,), 5, jnp.int32)
    params = net.init({"params": jax.random.PRNGKey(0), "dropout":
                       jax.random.PRNGKey(0)}, x, mask, lens, None,
                      deterministic=True)["params"]

    # Two parents with the SAME name ("net") so the stand-ins' rng fold
    # paths match the unfused modules' — truncnorm values must then be
    # bit-identical, proving fused-path checkpoints load into the
    # unfused path unchanged.
    from coot_videotext_tpu.models.layers import (MLP, CootLayerNorm)

    class UnfusedParent(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = CootLayerNorm(dtype=jnp.float32)(x)
            return MLP(cfg=cfg.input_fc_config,
                       init_type=cfg.weight_init_type,
                       init_std=cfg.weight_init_std,
                       dtype=jnp.float32, name="input_fc")(x)

    class StandinParent(nn.Module):
        @nn.compact
        def __call__(self, x):
            g, b = _CootNormParams(dim=48, name="CootLayerNorm_0")()
            w, bb = _InputFCParams(din=48, dout=32,
                                   init_type=cfg.weight_init_type,
                                   init_std=cfg.weight_init_std,
                                   name="input_fc")()
            return g, b, w, bb

    x48 = jnp.zeros((2, 48))
    up = UnfusedParent(name="net").init(jax.random.PRNGKey(7),
                                        x48)["params"]
    sp = StandinParent(name="net").init(jax.random.PRNGKey(7),
                                        x48)["params"]
    assert set(sp.keys()) == {"CootLayerNorm_0", "input_fc"}
    for path in (("CootLayerNorm_0", "gain"), ("CootLayerNorm_0", "bias"),
                 ("input_fc", "fc_0", "kernel"),
                 ("input_fc", "fc_0", "bias")):
        a, b = sp, up
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))

    # and the real model's tree contains the same leaves/shapes
    assert params["CootLayerNorm_0"]["gain"].shape == (48,)
    assert params["input_fc"]["fc_0"]["kernel"].shape == \
        sp["input_fc"]["fc_0"]["kernel"].shape


def test_fwd_kernel_matches_reference():
    """Real kernel logic vs the XLA reference. On CPU the kernel runs
    under the pallas TPU interpret machine (no skip); on a real chip the
    same call compiles — so this test covers the kernel everywhere."""
    from coot_videotext_tpu.ops.pallas_input_fc import (
        _fwd_call, fused_input_fc)
    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.RandomState(0)
    # small-ish shape so interpret mode stays fast; still 128-aligned
    x = jnp.asarray(rng.randn(128, 256), jnp.bfloat16)
    gain = jnp.asarray(rng.rand(256) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(256) * 0.1, jnp.float32)
    w = jnp.asarray(rng.randn(256, 128) * 0.02, jnp.float32)
    b = jnp.asarray(rng.randn(128) * 0.01, jnp.float32)
    if on_tpu:
        yk = jax.jit(lambda *a: fused_input_fc(*a, 1e-6, "gelu"))(
            x, gain, bias, w, b)
    else:
        yk, _ = _fwd_call(x, gain, bias, w, b, 1e-6, "gelu",
                          need_pre=False, interpret=True)
    yr = np.asarray(fused_input_fc_reference(x, gain, bias, w, b, 1e-6,
                                             "gelu"), np.float32)
    scale = max(np.abs(yr).max(), 1e-6)
    assert np.abs(np.asarray(yk, np.float32) - yr).max() / scale < 5e-3

    # the pre-activation residual path (backward's input) too
    ym, pre = _fwd_call(x, gain, bias, w, b, 1e-6, "gelu", need_pre=True,
                        interpret=not on_tpu)
    np.testing.assert_array_equal(np.asarray(ym, np.float32),
                                  np.asarray(yk, np.float32))
    assert pre.dtype == jnp.float32 and pre.shape == (128, 128)


def test_bwd_kernel_matches_reference_grads():
    """Backward kernel (interpret on CPU / compiled on TPU) vs autodiff
    through the XLA reference — all four parameter cotangents."""
    from coot_videotext_tpu.ops.pallas_input_fc import (
        _bwd_call, _fwd_call)
    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.RandomState(1)
    shapes = [(jnp.float32, 128, 256, 128)]
    if on_tpu:
        # the bf16 din=4096 shape whose bwd kernel once blew the 16M
        # scoped-vmem limit (regression: accumulate into out refs) —
        # too slow for the CPU interpreter, exercised compiled only
        shapes.append((jnp.bfloat16, 5120, 4096, 384))
    for dtype, s, din, dout in shapes:
        x2 = jnp.asarray(rng.randn(s, din), dtype)
        gain2 = jnp.asarray(1 + 0.1 * rng.randn(din), jnp.float32)
        bias2 = jnp.asarray(0.1 * rng.randn(din), jnp.float32)
        w2 = jnp.asarray(0.05 * rng.randn(din, dout), jnp.float32)
        b2 = jnp.asarray(0.1 * rng.randn(dout), jnp.float32)

        def loss(g, bi, ww, bb):
            y = fused_input_fc_reference(x2, g, bi, ww, bb, 1e-6, "gelu")
            return jnp.sum(jnp.square(y.astype(jnp.float32)))

        gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
            gain2, bias2, w2, b2)

        _, pre = _fwd_call(x2, gain2, bias2, w2, b2, 1e-6, "gelu",
                           need_pre=True, interpret=not on_tpu)
        y = fused_input_fc_reference(x2, gain2, bias2, w2, b2, 1e-6,
                                     "gelu")
        dy = (2.0 * y.astype(jnp.float32)).astype(x2.dtype)
        _, dgain, dbias, dw, db = _bwd_call(
            x2, gain2, bias2, w2, pre, dy, 1e-6, "gelu",
            interpret=not on_tpu)
        gk = (dgain, dbias, dw, db)
        for name, a, b_ in zip(("dgain", "dbias", "dw", "db"), gk, gr):
            sc = max(float(jnp.abs(b_).max()), 1e-6)
            err = float(jnp.abs(a - b_).max()) / sc
            assert err < 5e-3, (dtype, name, err)


def test_bwd_vmem_footprint_within_scoped_limit():
    """The block-row picker must keep the modeled backward footprint
    under the 16M scoped-vmem hardware limit for every supported
    (din, dout, dtype) — the round-2 OOM came from an optimistic
    footprint model (missing double buffering + a duplicate dW
    accumulator), not from an oversized pick."""
    from coot_videotext_tpu.ops.pallas_input_fc import (
        _VMEM_BUDGET, _bwd_footprint, _pick_block_rows)

    hard_limit = 16 * 1024 * 1024
    assert _VMEM_BUDGET <= hard_limit
    for din in (1024, 1536, 2048, 4096):
        for dout in (256, 384, 512):
            for itemsize in (2, 4):
                fixed, per_row = _bwd_footprint(din, dout, itemsize)
                if fixed + 32 * per_row > _VMEM_BUDGET:
                    continue  # fused_input_fc_available() rejects these
                for s in (512, 5120, 8192):
                    bs = _pick_block_rows(s, din, dout, itemsize,
                                          bwd=True)
                    assert bs >= 1 and s % bs == 0
                    assert fixed + bs * per_row <= hard_limit, (
                        din, dout, itemsize, s, bs)
    # the exact shape that OOMed in round 2 must still be available and
    # fit: bf16, din=4096, dout=384 at 5120 rows
    fixed, per_row = _bwd_footprint(4096, 384, 2)
    bs = _pick_block_rows(5120, 4096, 384, 2, bwd=True)
    assert bs >= 32
    assert fixed + bs * per_row <= hard_limit
