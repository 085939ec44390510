"""
Masked multi-head attention, post-LN transformer encoder/decoder stacks.

Behavioral parity with reference transformer_legacy.py:347-605:
    - explicit q/k/v/final projections (all d_model -> d_model)
    - scores / sqrt(d_head), masked positions filled with -INF (=32752, the
      fp16-safe constant) BEFORE softmax; softmax over keys in float32
    - post-LN residual sublayers: LN(residual + sublayer(x)) with the COOT
      layer-norm variant
    - an extra dropout between the attention sublayer and the FFN sublayer
      (transformer_legacy.py:430-436)

Mask convention throughout this package: True/1 = VALID token (the reference's
retrieval stack uses the inverse; conversion happens in the data layer).

TPU notes: the attention core is a single fused region for XLA (two batched
matmuls + softmax); for the shapes COOT uses (L<=512, d<=384) XLA's fusion is
already near roofline, and a Pallas flash-attention path is available via
`coot_videotext_tpu.ops.masked_attention` for long sequences.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from coot_videotext_tpu.models.configs import TransformerEncoderConfig
from coot_videotext_tpu.models.layers import (Dropout, make_activation, make_bias_initializer, make_initializer,
    make_normalization)
from coot_videotext_tpu.typext import INF

Dtype = Any


def einsum_f32(spec: str, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """
    Einsum with float32 accumulation. On TPU this is the native MXU op
    (bf16 x bf16 -> f32); the XLA CPU backend doesn't implement that dot
    shape, so low-precision inputs are upcast there instead (tests /
    dry runs run on the CPU backend).
    """
    if jax.default_backend() == "cpu" and a.dtype != jnp.float32:
        return jnp.einsum(spec, a.astype(jnp.float32),
                          b.astype(jnp.float32))
    return jnp.einsum(spec, a, b, preferred_element_type=jnp.float32)


def masked_softmax(scores: jnp.ndarray, mask: Optional[jnp.ndarray],
                   axis: int = -1,
                   out_dtype: Optional[Dtype] = None) -> jnp.ndarray:
    """
    Softmax with -INF fill on invalid positions (reference
    transformer_legacy.py:544 masked_fill with -INF).

    out_dtype=float32 (default): everything in f32 — bit-matches the
    reference's fp32 path and our golden parity tests.

    out_dtype=bfloat16: the big (..., q, k) tensors are STORED in bf16
    with reductions in f32 — mirroring the reference's AMP fp16 path
    (autocast matmul emits fp16 scores, masked_fill runs in fp16 with the
    fp16-safe INF=32752, softmax upcasts internally). On TPU this halves
    the dominant HBM traffic of the attention layers: measured on v5e,
    MultiHeadAttention fwd+bwd on (1024, 80, 384) spends ~7.5 GB/step of
    bandwidth with f32 score materialization.

    Args:
        scores: attention logits (..., q, k), any float dtype
        mask: validity mask broadcastable to scores; True = attend.
    """
    if out_dtype is None or out_dtype == jnp.float32:
        scores = scores.astype(jnp.float32)
        if mask is not None:
            scores = jnp.where(mask, scores, -INF)
        return jax.nn.softmax(scores, axis=axis)
    s = scores.astype(out_dtype)
    if mask is not None:
        s = jnp.where(mask, s, jnp.asarray(-INF, out_dtype))
    m = jax.lax.stop_gradient(jnp.max(s, axis=axis, keepdims=True))
    e = jnp.exp((s - m).astype(jnp.float32)).astype(out_dtype)
    z = jnp.sum(e.astype(jnp.float32), axis=axis, keepdims=True)
    return (e.astype(jnp.float32) / z).astype(out_dtype)


def _use_pallas_attention(use_pallas: Optional[bool], lk: int,
                          dropout_active: bool) -> bool:
    """
    Resolve the pallas-attention knob. None = auto: honest chain-difference
    timing on the real v5e chip (scan-chained steps; the tunnel's
    block_until_ready is a no-op, so naive timings are dispatch-only) shows
    the fused kernel (ops/pallas_attention.py) wins only at long sequences:
    n=512 L=512 dh=48 bwd 2.7ms pallas vs 5.6ms XLA (fwd at/under noise vs
    1.8ms), a wash at L=128, and a clear LOSS at COOT's typical L=80
    (n=4096 dh=48: bwd 7.7ms pallas vs 0.6ms XLA — the flash-style
    recompute doesn't pay off when the whole row of scores fits in VMEM
    anyway). Auto therefore enables it on the tpu backend only for
    Lk >= 256 with attention dropout off (the kernel fuses softmax+PV, so
    probabilities aren't materialized to drop); COOT/MART's stock shapes
    stay on the XLA path.
    """
    import os
    if dropout_active:
        return False
    if use_pallas is None:
        env = os.environ.get("COOT_TPU_PALLAS_ATTENTION")
        if env is not None:
            return env not in ("0", "false", "False")
        return jax.default_backend() == "tpu" and lk >= 256
    if use_pallas:
        return jax.default_backend() == "tpu"
    return False


class MultiHeadAttention(nn.Module):
    """Multi-head attention (reference transformer_legacy.py:470).
    `use_pallas`: None = auto, True/False = force (see
    _use_pallas_attention)."""
    num_heads: int
    d_model: int
    dropout: float = 0.0
    init_type: str = "truncnorm"
    init_std: float = 0.01
    dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, query: jnp.ndarray, key: jnp.ndarray,
                 value: jnp.ndarray, mask: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True) -> jnp.ndarray:
        """
        Args:
            query: (B, Lq, D)
            key/value: (B, Lk, D)
            mask: validity mask (B, Lq, Lk) or (B, 1, Lk); True = attend.
        """
        assert self.d_model % self.num_heads == 0
        d_head = self.d_model // self.num_heads
        kinit = make_initializer(self.init_type, self.init_std)
        binit = make_bias_initializer(self.init_type, self.init_std)
        dense = lambda nm: nn.Dense(  # noqa: E731
            self.d_model, kernel_init=kinit, bias_init=binit,
            dtype=self.dtype, param_dtype=jnp.float32, name=nm)

        b, lq, _ = query.shape
        lk = key.shape[1]
        q = dense("query_projection")(query).reshape(
            b, lq, self.num_heads, d_head)
        k = dense("key_projection")(key).reshape(
            b, lk, self.num_heads, d_head)
        v = dense("value_projection")(value).reshape(
            b, lk, self.num_heads, d_head)

        dropout_active = self.dropout > 0 and not deterministic
        if (mask is not None and _use_pallas_attention(
                self.use_pallas, lk, dropout_active)):
            from coot_videotext_tpu.ops.pallas_attention import (
                pallas_masked_attention)
            h = self.num_heads
            qf = q.transpose(0, 2, 1, 3).reshape(b * h, lq, d_head)
            kf = k.transpose(0, 2, 1, 3).reshape(b * h, lk, d_head)
            vf = v.transpose(0, 2, 1, 3).reshape(b * h, lk, d_head)
            mf = jnp.broadcast_to(mask[:, None], (b, h) + mask.shape[1:])
            mf = jnp.broadcast_to(mf, (b, h, lq, lk)).reshape(
                b * h, lq, lk)
            ctx = pallas_masked_attention(
                qf, kf, vf, mf, 1.0 / float(d_head) ** 0.5)
            ctx = ctx.reshape(b, h, lq, d_head).transpose(0, 2, 1, 3)
            ctx = ctx.astype(self.dtype).reshape(b, lq, self.d_model)
            return dense("final_projection")(ctx)

        # (B, H, Lq, Lk) logits; accumulate in f32 on the MXU. In bf16
        # mode fold the 1/sqrt(d) scale into q and emit bf16 scores
        # directly so the (B, H, Lq, Lk) tensor is never stored in f32
        # (mirrors the reference's AMP fp16 scores; see masked_softmax).
        if self.dtype != jnp.float32:
            q = q * jnp.asarray(1.0 / float(d_head) ** 0.5, q.dtype)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=self.dtype)
        else:
            scores = einsum_f32("bqhd,bkhd->bhqk", q, k)
            scores = scores / jnp.sqrt(jnp.float32(d_head))
        attn_mask = None
        if mask is not None:
            attn_mask = mask[:, None, :, :]  # broadcast over heads
        attn = masked_softmax(scores, attn_mask, out_dtype=self.dtype)
        attn = attn.astype(self.dtype)
        if self.dropout > 0:
            attn = Dropout(rate=self.dropout)(
                attn, deterministic=deterministic)
        ctx = einsum_f32("bhqk,bkhd->bqhd", attn, v)
        ctx = ctx.astype(self.dtype).reshape(b, lq, self.d_model)
        return dense("final_projection")(ctx)


class PointwiseFeedForward(nn.Module):
    """FFN: Linear-Dropout-Act-Linear-Dropout (reference :582)."""
    d_ff: int
    d_model: int
    dropout: float
    cfg: TransformerEncoderConfig
    init_type: str = "truncnorm"
    init_std: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *,
                 deterministic: bool = True) -> jnp.ndarray:
        kinit = make_initializer(self.init_type, self.init_std)
        binit = make_bias_initializer(self.init_type, self.init_std)
        act = make_activation(self.cfg.activation)
        d_ff = self.d_ff if self.d_ff > 0 else self.d_model
        x = nn.Dense(d_ff, kernel_init=kinit, bias_init=binit,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        if self.dropout > 0:
            x = Dropout(rate=self.dropout)(x, deterministic=deterministic)
        x = act(x)
        x = nn.Dense(self.d_model, kernel_init=kinit, bias_init=binit,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(x)
        if self.dropout > 0:
            x = Dropout(rate=self.dropout)(x, deterministic=deterministic)
        return x


class TransformerEncoderLayer(nn.Module):
    """
    Post-LN encoder layer (reference :396-438): x = LN(x + attn(x)); then an
    extra dropout; then x = LN(x + ffn(x)).
    """
    cfg: TransformerEncoderConfig
    init_type: str = "truncnorm"
    init_std: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray, key: jnp.ndarray,
                 value: jnp.ndarray, mask: Optional[jnp.ndarray], *,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        attn_out = MultiHeadAttention(
            num_heads=cfg.num_heads, d_model=cfg.hidden_dim,
            dropout=cfg.dropout, init_type=self.init_type,
            init_std=self.init_std, dtype=self.dtype,
            name="self_attention")(
                query, key, value, mask, deterministic=deterministic)
        x = attn_out + query
        norm1 = make_normalization(cfg.norm, cfg.norm.name, self.dtype)
        if norm1 is not None:
            x = norm1(x)
        if cfg.dropout > 0:
            x = Dropout(rate=cfg.dropout)(x, deterministic=deterministic)
        ffn_out = PointwiseFeedForward(
            d_ff=cfg.pointwise_ff_dim, d_model=cfg.hidden_dim,
            dropout=cfg.dropout, cfg=cfg, init_type=self.init_type,
            init_std=self.init_std, dtype=self.dtype,
            name="pointwise_ff")(x, deterministic=deterministic)
        x2 = ffn_out + x
        norm2 = make_normalization(cfg.norm, cfg.norm.name, self.dtype)
        if norm2 is not None:
            x2 = norm2(x2)
        return x2


class TransformerEncoder(nn.Module):
    """Self-attention stack (reference :347-367)."""
    cfg: TransformerEncoderConfig
    init_type: str = "truncnorm"
    init_std: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray], *,
                 deterministic: bool = True) -> jnp.ndarray:
        """
        Args:
            x: (B, L, D)
            mask: validity mask (B, L); True = valid. Expanded to
                (B, L, L) key-masking as in the reference (:361).
        """
        mask_expanded = None
        if mask is not None:
            # key-only masking: every query may attend to all valid keys
            mask_expanded = jnp.broadcast_to(
                mask[:, None, :].astype(bool),
                (x.shape[0], x.shape[1], x.shape[1]))
        for i in range(self.cfg.num_layers):
            x = TransformerEncoderLayer(
                cfg=self.cfg, init_type=self.init_type,
                init_std=self.init_std, dtype=self.dtype,
                name=f"layer_{i}")(
                    x, x, x, mask_expanded, deterministic=deterministic)
        return x


class TransformerDecoder(nn.Module):
    """Cross-attention stack: query attends to key_value (reference :369)."""
    cfg: TransformerEncoderConfig
    init_type: str = "truncnorm"
    init_std: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray, key_value: jnp.ndarray,
                 mask: Optional[jnp.ndarray], *,
                 deterministic: bool = True) -> jnp.ndarray:
        """
        Args:
            query: (B, Lq, D)
            key_value: (B, Lk, D)
            mask: key validity mask (B, Lk); True = valid.
        """
        mask_expanded = None
        if mask is not None:
            mask_expanded = jnp.broadcast_to(
                mask[:, None, :].astype(bool),
                (query.shape[0], query.shape[1], key_value.shape[1]))
        x = query
        for i in range(self.cfg.num_layers):
            x = TransformerEncoderLayer(
                cfg=self.cfg, init_type=self.init_type,
                init_std=self.init_std, dtype=self.dtype,
                name=f"layer_{i}")(
                    x, key_value, key_value, mask_expanded,
                    deterministic=deterministic)
        return x
