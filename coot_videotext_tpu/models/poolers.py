"""
Sequence poolers: generalized attention pooling (GenPool) and the COOT
average pool.

Parity with reference nntrainer/models/poolers.py:
    - GenPool (:111-205): per-head 2-layer MLP on features -> masked softmax
      over the sequence (fill -INF) -> weighted sum. Head weights are stored
      as stacked (heads, in, out) tensors like the reference so the math (and
      a future torch-checkpoint converter) line up.
    - MultiGenPool (:84): the reference feeds each pool's OUTPUT into the next
      pool, so only num_layers=1 is functional; all configs use 1, we assert.
    - TemporalAvgPool (:232, "avg_special"): sum over the WHOLE padded
      sequence / lengths — the reference ignores the mask here (quirk
      reproduced exactly; verified against the torch net in
      tests/test_torch_convert.py). The masked variant (reference
      TemporalAvgPoolFixed :244, never instantiated there) backs "avg".

Mask convention: True = valid.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from coot_videotext_tpu.models.configs import PoolerConfig, PoolerConst
from coot_videotext_tpu.models.attention import einsum_f32
from coot_videotext_tpu.models.layers import Dropout, make_activation, make_initializer
from coot_videotext_tpu.typext import INF
from coot_videotext_tpu.models.attention import masked_softmax

Dtype = Any


class GenPool(nn.Module):
    """
    Generalized pooling ('Enhancing Sentence Embedding with Generalized
    Pooling'), reference poolers.py:111.
    """
    d_input: int
    d_attn: int
    num_heads: int
    dropout: float
    activation_cfg: Any
    init_type: str = "truncnorm"
    init_std: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray, mask: jnp.ndarray,
                 lengths: jnp.ndarray, *,
                 deterministic: bool = True) -> jnp.ndarray:
        """
        Args:
            features: (B, L, D)
            mask: validity mask (B, L), True = valid
            lengths: (B,) unused (parity with reference signature)

        Returns:
            pooled (B, D)
        """
        d_attn = self.d_attn if self.d_attn > 0 else self.d_input
        assert d_attn % self.num_heads == 0
        d_head = d_attn // self.num_heads
        assert self.d_input % self.num_heads == 0
        d_head_out = self.d_input // self.num_heads
        init = make_initializer(self.init_type, self.init_std)
        w1 = self.param("genpool_w1_head", init,
                        (self.num_heads, self.d_input, d_head), jnp.float32)
        b1 = self.param("genpool_b1_head", init,
                        (self.num_heads, d_head), jnp.float32)
        w2 = self.param("genpool_w2_head", init,
                        (self.num_heads, d_head, d_head_out), jnp.float32)
        b2 = self.param("genpool_b2_head", init,
                        (self.num_heads, d_head_out), jnp.float32)
        act = make_activation(self.activation_cfg)

        f = features.astype(self.dtype)

        # TPU layout: the per-head 2-layer MLP runs FLAT over the feature
        # axis — one (D_in, H*d_head) dot, then one block-diagonal
        # (H*d_head, H*d_head_out) dot — instead of per-head batched
        # einsums, whose (B, H, L, d) relayouts cost ~2x wall-clock on
        # v5e. The head-stacked parameter layout (reference
        # poolers.py:129-139) is unchanged, and the flat element order
        # [h*d_out + o] equals the reference's transpose+reshape head
        # interleave, so no final transpose is needed either.
        def mm(spec, a, w):
            if self.dtype != jnp.float32:
                return jnp.einsum(spec, a, w.astype(self.dtype),
                                  preferred_element_type=self.dtype)
            return einsum_f32(spec, a, w)

        w1_flat = jnp.transpose(w1, (1, 0, 2)).reshape(
            self.d_input, self.num_heads * d_head)
        w2_blk = jnp.zeros(
            (self.num_heads * d_head, self.num_heads * d_head_out),
            jnp.float32)
        for hh in range(self.num_heads):
            w2_blk = w2_blk.at[hh * d_head:(hh + 1) * d_head,
                               hh * d_head_out:(hh + 1) * d_head_out].set(
                                   w2[hh])

        # Opt-in fused Pallas kernel (ops/pallas_genpool.py): the whole
        # MLP -> masked softmax -> weighted-sum subgraph in one VMEM
        # pass. Gradients to the head-stacked params flow through the
        # flat-layout constructions above (their VJPs are the transpose
        # / block-diagonal extraction). Dropout uses the on-core
        # hardware PRNG — same Bernoulli law, different stream than
        # flax Dropout (documented in the kernel header).
        from coot_videotext_tpu.ops.pallas_genpool import (
            fused_genpool, fused_genpool_mode)
        mode = fused_genpool_mode(
            f.shape[0], f.shape[1], self.d_input,
            self.num_heads * d_head, self.activation_cfg.name,
            jnp.dtype(self.dtype).itemsize)
        if mode is not None:
            rate = float(self.dropout)
            train = rate > 0 and not deterministic
            if train:
                key = self.make_rng("dropout")
                seed = jax.random.key_data(key).reshape(-1)[-1:].astype(
                    jnp.int32)
            else:
                seed = jnp.zeros(1, jnp.int32)
            return fused_genpool(
                f, mask, w1_flat, b1.reshape(-1), w2_blk, b2.reshape(-1),
                seed, self.activation_cfg.name, rate, train,
                mode == "interpret")

        # (B, L, H*d_head)
        h = mm("bld,dk->blk", f, w1_flat).astype(self.dtype)
        h = h + b1.reshape(-1).astype(self.dtype)
        if self.dropout > 0:
            h = Dropout(rate=self.dropout)(h, deterministic=deterministic)
        h = act(h)
        # (B, L, H*d_head_out = D)
        h = mm("blk,ko->blo", h, w2_blk).astype(self.dtype)
        h = h + b2.reshape(-1).astype(self.dtype)
        if self.dropout > 0:
            h = Dropout(rate=self.dropout)(h, deterministic=deterministic)

        # masked softmax over the sequence axis; f32 in f32 mode, bf16
        # storage with f32 reductions in bf16 mode (reference fills -INF
        # where padded, softmax dim=2; fp16 under the reference AMP)
        smweights = masked_softmax(
            h, mask[:, :, None].astype(bool), axis=1,
            out_dtype=self.dtype)
        smweights = smweights.astype(self.dtype)
        if self.dropout > 0:
            smweights = Dropout(rate=self.dropout)(
                smweights, deterministic=deterministic)
        pooled = jnp.sum(f * smweights, axis=1)
        return pooled


class MultiGenPool(nn.Module):
    """Stacked GenPool (reference poolers.py:84). Only 1 layer functional."""
    cfg: PoolerConfig
    d_input: int
    init_type: str = "truncnorm"
    init_std: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray, mask: jnp.ndarray,
                 lengths: jnp.ndarray, *,
                 deterministic: bool = True) -> jnp.ndarray:
        assert self.cfg.num_layers == 1, (
            "MultiGenPool >1 layer is nonfunctional in the reference "
            "(each pool output feeds the next pool); all configs use 1.")
        return GenPool(
            d_input=self.d_input, d_attn=self.cfg.hidden_dim,
            num_heads=self.cfg.num_heads, dropout=self.cfg.dropout,
            activation_cfg=self.cfg.activation, init_type=self.init_type,
            init_std=self.init_std, dtype=self.dtype,
            name="pool_0")(features, mask, lengths,
                           deterministic=deterministic)


class TemporalAvgPool(nn.Module):
    """
    The reference's 'avg_special' pool (poolers.py:232): sums over the
    ENTIRE sequence — padded positions included, which after key-masked
    attention hold non-zero values — and divides by the valid length. The
    mask is deliberately ignored there; but "entire sequence" in the
    reference means rows 0..batch_max-1, because its collate pads exactly
    to the batch's max part count. Our static-shape batches pad FURTHER
    (bucketed n_parts), so a literal all-rows sum includes garbage rows
    the reference never sums — measured 3.7 pts v2p on a converted
    reference checkpoint (round 4). Exact parity under static shapes:
    sum rows with index < max(lengths) — the same dynamic-VALUE batch
    max the reference's shapes encode, with no dynamic shape. (The
    attention outputs at those garbage rows are themselves parity-exact
    deterministic functions of the valid keys, so this reproduces the
    reference sum term for term. Under data parallelism jnp.max over the
    sharded batch is the global batch max, matching the reference's
    single-process batch. The truly masked variant exists in the
    reference as TemporalAvgPoolFixed :244 but is never instantiated.)
    """

    @nn.compact
    def __call__(self, features: jnp.ndarray, mask: jnp.ndarray,
                 lengths: jnp.ndarray, *,
                 deterministic: bool = True) -> jnp.ndarray:
        batch_max = jnp.max(lengths)
        in_ref_rows = (jnp.arange(features.shape[1]) < batch_max)
        summed = jnp.sum(
            features * in_ref_rows[None, :, None].astype(features.dtype),
            axis=1)
        return summed / jnp.maximum(
            lengths.astype(features.dtype)[:, None], 1.0)


class TemporalAvgPoolMasked(nn.Module):
    """Masked mean (reference TemporalAvgPoolFixed poolers.py:244)."""

    @nn.compact
    def __call__(self, features: jnp.ndarray, mask: jnp.ndarray,
                 lengths: jnp.ndarray, *,
                 deterministic: bool = True) -> jnp.ndarray:
        valid = mask.astype(features.dtype)[:, :, None]
        summed = jnp.sum(features * valid, axis=1)
        return summed / jnp.maximum(
            lengths.astype(features.dtype)[:, None], 1.0)


class TemporalMaxPool(nn.Module):
    """Masked max over the sequence (reference poolers.py:211)."""

    @nn.compact
    def __call__(self, features: jnp.ndarray, mask: jnp.ndarray,
                 lengths: jnp.ndarray, *,
                 deterministic: bool = True) -> jnp.ndarray:
        filled = jnp.where(mask[:, :, None].astype(bool), features, -INF)
        return jnp.max(filled, axis=1)


class TemporalLastPool(nn.Module):
    """Last valid element (reference poolers.py 'last')."""

    @nn.compact
    def __call__(self, features: jnp.ndarray, mask: jnp.ndarray,
                 lengths: jnp.ndarray, *,
                 deterministic: bool = True) -> jnp.ndarray:
        idx = jnp.maximum(lengths - 1, 0)
        return jnp.take_along_axis(
            features, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]


class TemporalFirstPool(nn.Module):
    """First element, e.g. CLS (reference poolers.py 'first')."""

    @nn.compact
    def __call__(self, features: jnp.ndarray, mask: jnp.ndarray,
                 lengths: jnp.ndarray, *,
                 deterministic: bool = True) -> jnp.ndarray:
        return features[:, 0]


def make_pooler(cfg: PoolerConfig, d_input: int, init_type: str,
                init_std: float, dtype: Dtype, name: str) -> nn.Module:
    """Pooler factory (reference poolers.py:24 make_pooler_module)."""
    if cfg.name == PoolerConst.ATN:
        return MultiGenPool(cfg=cfg, d_input=d_input, init_type=init_type,
                            init_std=init_std, dtype=dtype, name=name)
    if cfg.name == PoolerConst.AVG_SPECIAL:
        return TemporalAvgPool(name=name)
    if cfg.name == PoolerConst.MAX:
        return TemporalMaxPool(name=name)
    if cfg.name == PoolerConst.AVG:
        return TemporalAvgPoolMasked(name=name)
    if cfg.name == PoolerConst.LAST:
        return TemporalLastPool(name=name)
    if cfg.name == PoolerConst.FIRST:
        return TemporalFirstPool(name=name)
    raise ValueError(f"Unknown pooler {cfg.name}")
