"""
Fused GenPool kernel (ops/pallas_genpool.py) tests.

On the CPU test backend the real kernel logic runs under the pallas TPU
interpret machine (no skips); on a real chip the same calls compile.
Deterministic paths (rate=0) are pinned against the unfused XLA
reference AND against the production GenPool flax module; dropout paths
are checked statistically + for fwd/bwd mask identity, mirroring
tests/test_pallas_dropout-style evidence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coot_videotext_tpu.ops.pallas_genpool import (
    _bwd_call, _fwd_call, fused_genpool_reference, head_params_to_flat)

S, L, D, HEADS = 8, 16, 128, 2
H = 256  # pooler hidden (d_attn)
ON_TPU = jax.default_backend() == "tpu"
INTERP = not ON_TPU


def _setup(seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    f = jnp.asarray(rng.randn(S, L, D), dtype)
    mask = np.ones((S, L), bool)
    for i in range(S):  # ragged validity incl. one all-invalid row
        mask[i, rng.randint(2, L):] = False
    mask[-1, :] = False
    mask = jnp.asarray(mask)
    w1h = rng.randn(HEADS, D, H // HEADS).astype(np.float32) * 0.1
    b1h = rng.randn(HEADS, H // HEADS).astype(np.float32) * 0.1
    w2h = rng.randn(HEADS, H // HEADS, D // HEADS).astype(np.float32) * 0.1
    b2h = rng.randn(HEADS, D // HEADS).astype(np.float32) * 0.1
    w1, b1, w2, b2 = (jnp.asarray(a) for a in
                      head_params_to_flat(w1h, b1h, w2h, b2h))
    return f, mask, w1, b1, w2, b2


@pytest.mark.parametrize("act", ["gelu", "relu", "none"])
def test_fwd_matches_reference_deterministic(act):
    f, mask, w1, b1, w2, b2 = _setup()
    seed = jnp.zeros(1, jnp.int32)
    out = _fwd_call(f, mask, w1, b1, w2, b2, seed, act, 0.0, False,
                    interpret=INTERP)
    ref = fused_genpool_reference(f, mask, w1, b1, w2, b2, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fwd_matches_genpool_module():
    """The kernel must equal the production flax GenPool (deterministic)
    given the SAME head-stacked parameters."""
    from coot_videotext_tpu.models.poolers import GenPool
    from coot_videotext_tpu.models.configs import ActivationConfig

    f, mask, w1, b1, w2, b2 = _setup(seed=3)
    rng = np.random.RandomState(3)
    w1h = rng.randn(HEADS, D, H // HEADS).astype(np.float32) * 0.1
    # regenerate the same head params _setup drew (same rng stream after
    # f/mask draws) — simpler: rebuild flat from fresh heads and reuse
    b1h = rng.randn(HEADS, H // HEADS).astype(np.float32) * 0.1
    w2h = rng.randn(HEADS, H // HEADS, D // HEADS).astype(np.float32) * 0.1
    b2h = rng.randn(HEADS, D // HEADS).astype(np.float32) * 0.1
    w1f, b1f, w2f, b2f = (jnp.asarray(a) for a in
                          head_params_to_flat(w1h, b1h, w2h, b2h))

    pool = GenPool(d_input=D, d_attn=H, num_heads=HEADS, dropout=0.0,
                   activation_cfg=ActivationConfig("gelu"))
    params = {"genpool_w1_head": jnp.asarray(w1h),
              "genpool_b1_head": jnp.asarray(b1h),
              "genpool_w2_head": jnp.asarray(w2h),
              "genpool_b2_head": jnp.asarray(b2h)}
    lens = jnp.sum(mask, axis=1).astype(jnp.int32)
    mod = pool.apply({"params": params}, f, mask, lens,
                     deterministic=True)
    out = _fwd_call(f, mask, w1f, b1f, w2f, b2f,
                    jnp.zeros(1, jnp.int32), "gelu", 0.0, False,
                    interpret=INTERP)
    # 1e-4: on-chip, XLA's einsum and the kernel's dot_general take
    # different f32-via-bf16 matmul pass structures — last-ulp scatter
    # (observed max 6.4e-5 on v5e); real wiring bugs are O(1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(mod),
                               rtol=1e-4, atol=1e-4)


def test_bwd_matches_autodiff_deterministic():
    f, mask, w1, b1, w2, b2 = _setup(seed=1)
    seed = jnp.zeros(1, jnp.int32)

    def loss(f_, w1_, b1_, w2_, b2_):
        y = fused_genpool_reference(f_, mask, w1_, b1_, w2_, b2_, "gelu")
        return jnp.sum(jnp.square(y))

    grads_ref = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(f, w1, b1, w2, b2)
    y = fused_genpool_reference(f, mask, w1, b1, w2, b2, "gelu")
    dout = 2.0 * y
    df, dw1, db1, dw2, db2 = _bwd_call(
        f, mask, w1, b1, w2, b2, seed, dout, "gelu", 0.0, False,
        interpret=INTERP)
    for name, a, b_ in zip(("df", "dw1", "db1", "dw2"),
                           (df, dw1, db1, dw2), grads_ref):
        sc = max(float(jnp.abs(b_).max()), 1e-6)
        err = float(jnp.abs(a.astype(jnp.float32)
                            - b_.astype(jnp.float32)).max()) / sc
        assert err < 2e-4, (name, err)
    # db2 is degenerate here: b2[d] shifts every valid logit of a softmax
    # column by the same constant and softmax is shift-invariant, so the
    # deterministic gradient is identically zero — both kernel and
    # autodiff produce pure cancellation roundoff (~1e-7 vs the ~1.4
    # db1 scale), which a noise-to-noise relative check cannot compare.
    # Assert both land at roundoff level of the problem scale instead.
    # (Under dropout, keep2 breaks the uniform shift and b2 goes live —
    # that path is exercised on-chip in the dropout test below.)
    sc = max(float(jnp.abs(db1).max()), 1e-6)
    assert float(jnp.abs(db2).max()) / sc < 1e-5
    assert float(jnp.abs(grads_ref[4]).max()) / sc < 1e-5


def test_dw2_offdiagonal_matches_dense_autodiff():
    """dW2 is computed dense; it must equal autodiff's dense gradient
    including the off-diagonal blocks the module construction later
    discards."""
    f, mask, w1, b1, w2, b2 = _setup(seed=2)

    def loss(w2_):
        y = fused_genpool_reference(f, mask, w1, b1, w2_, b2, "relu")
        return jnp.sum(jnp.square(y))

    dw2_ref = jax.grad(loss)(w2)
    y = fused_genpool_reference(f, mask, w1, b1, w2, b2, "relu")
    _, _, _, dw2, _ = _bwd_call(
        f, mask, w1, b1, w2, b2, jnp.zeros(1, jnp.int32), 2.0 * y,
        "relu", 0.0, False, interpret=INTERP)
    sc = max(float(jnp.abs(dw2_ref).max()), 1e-6)
    assert float(jnp.abs(dw2 - dw2_ref).max()) / sc < 2e-4
    # off-diagonal blocks genuinely nonzero => the check is meaningful
    assert float(jnp.abs(dw2[: H // HEADS, D // HEADS:]).max()) > 0


def test_all_invalid_row_uniform_and_finite():
    """All-padded rows (invalid pack slots) must produce finite output
    — the finite -INF fill degrades to uniform weights like the module."""
    f, mask, w1, b1, w2, b2 = _setup(seed=4)
    out = _fwd_call(f, mask, w1, b1, w2, b2, jnp.zeros(1, jnp.int32),
                    "gelu", 0.0, False, interpret=INTERP)
    assert np.isfinite(np.asarray(out)).all()
    ref = fused_genpool_reference(f, mask, w1, b1, w2, b2, "gelu")
    np.testing.assert_allclose(np.asarray(out[-1]), np.asarray(ref[-1]),
                               rtol=2e-5, atol=2e-5)


def test_module_wiring_fused_vs_unfused(monkeypatch):
    """GenPool with COOT_TPU_FUSED_GENPOOL=interpret must route through
    the kernel and match the unfused module — values AND grads to the
    head-stacked params (through the flat-layout constructions)."""
    from coot_videotext_tpu.models.poolers import GenPool
    from coot_videotext_tpu.models.configs import ActivationConfig

    f, mask, *_ = _setup(seed=6)
    rng = np.random.RandomState(6)
    params = {
        "genpool_w1_head": jnp.asarray(
            rng.randn(HEADS, D, H // HEADS).astype(np.float32) * 0.1),
        "genpool_b1_head": jnp.asarray(
            rng.randn(HEADS, H // HEADS).astype(np.float32) * 0.1),
        "genpool_w2_head": jnp.asarray(
            rng.randn(HEADS, H // HEADS, D // HEADS).astype(np.float32)
            * 0.1),
        "genpool_b2_head": jnp.asarray(
            rng.randn(HEADS, D // HEADS).astype(np.float32) * 0.1)}
    pool = GenPool(d_input=D, d_attn=H, num_heads=HEADS, dropout=0.0,
                   activation_cfg=ActivationConfig("relu"))
    lens = jnp.sum(mask, axis=1).astype(jnp.int32)

    def run(p):
        return pool.apply({"params": p}, f, mask, lens,
                          deterministic=True)

    def loss(p):
        return jnp.sum(jnp.square(run(p)))

    out_unfused = run(params)
    g_unfused = jax.grad(loss)(params)
    monkeypatch.setenv("COOT_TPU_FUSED_GENPOOL", "interpret")
    out_fused = run(params)
    g_fused = jax.grad(loss)(params)
    np.testing.assert_allclose(np.asarray(out_fused),
                               np.asarray(out_unfused),
                               rtol=2e-5, atol=2e-5)
    # one shared scale: b2's true grad is identically zero (softmax
    # shift-invariance, see test_bwd_matches_autodiff_deterministic),
    # so measure every delta against the largest real gradient.
    sc = max(float(np.abs(np.asarray(g_unfused[k])).max())
             for k in params)
    for k in params:
        a, b_ = np.asarray(g_fused[k]), np.asarray(g_unfused[k])
        assert abs(a - b_).max() / sc < 2e-4, k


def test_dropout_determinism_and_fwd_bwd_mask_identity():
    """Dropout-path properties that hold on EVERY backend (interpret off
    chip, compiled on chip): same-seed determinism and backward
    re-deriving the forward's masks. Seed SENSITIVITY is asserted only
    on TPU inside the body below — interpret-mode prng_random_bits
    produces a degenerate stream that ignores pltpu.prng_seed (measured:
    seed and seed+1 give identical masks on CPU interpret), so off-chip
    it would test the emulator, not the kernel.
    tools/check_pallas_kernels_tpu.py covers the full statistics on
    hardware."""
    f, mask, w1, b1, w2, b2 = _setup(seed=5)
    seed = jnp.asarray([7], jnp.int32)
    rate = 0.5
    out1 = _fwd_call(f, mask, w1, b1, w2, b2, seed, "none", rate, True,
                     interpret=INTERP)
    out2 = _fwd_call(f, mask, w1, b1, w2, b2, seed, "none", rate, True,
                     interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    if ON_TPU:  # hardware PRNG: different seed => different masks
        out3 = _fwd_call(f, mask, w1, b1, w2, b2, seed + 1, "none", rate,
                         True)
        assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 0
    # backward re-derives the same masks: with act="none" the pipeline
    # is linear in f per mask draw, so df contracted with a probe equals
    # the directional difference quotient to f32 accuracy
    df, *_ = _bwd_call(f, mask, w1, b1, w2, b2, seed,
                       jnp.ones((S, D), jnp.float32), "none", rate, True,
                       interpret=INTERP)
    eps = 1e-3
    probe = jnp.asarray(np.random.RandomState(0).randn(S, L, D),
                        jnp.float32)
    o_plus = _fwd_call(f + eps * probe, mask, w1, b1, w2, b2, seed,
                       "none", rate, True, interpret=INTERP)
    o_minus = _fwd_call(f - eps * probe, mask, w1, b1, w2, b2, seed,
                        "none", rate, True, interpret=INTERP)
    fd = float(jnp.sum((o_plus - o_minus))) / (2 * eps)
    an = float(jnp.sum(df * probe))
    assert abs(fd - an) / max(abs(fd), 1e-3) < 5e-2
