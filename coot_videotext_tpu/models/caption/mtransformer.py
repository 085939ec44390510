"""
Masked ("vanilla") transformer captioning variant, Salesforce-densecap
style: each encoder layer's output feeds the matching decoder layer;
embedding matrix tied to the output projection scaled by sqrt(d).

Parity with reference mart/masked_transformer.py:1-281 (std-based
LayerNorm with eps on std, causal -1e10 triu fill inside Attention :73,
per-layer encoder->decoder wiring :205-217, tied embedding x sqrt(d)
:211). Heads are the torch chunk semantics (split feature dim).
"""

from __future__ import annotations

import math
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from coot_videotext_tpu.models.layers import Dropout

from coot_videotext_tpu.train.loss_caption import (
    cross_entropy_loss, label_smoothing_loss)

Dtype = Any
MT_INF = 1e10


def positional_encodings_like(x: jnp.ndarray) -> jnp.ndarray:
    """Per-channel sin/cos encodings (reference :28)."""
    length, d = x.shape[-2], x.shape[-1]
    positions = np.arange(length, dtype=np.float32)
    channels = np.arange(d)
    rates = 10000 ** (np.where(channels % 2 == 0, channels,
                               channels - 1) / d)
    angles = positions[:, None] / rates[None, :]
    enc = np.where(channels[None, :] % 2 == 0, np.sin(angles),
                   np.cos(angles)).astype(np.float32)
    return jnp.asarray(enc, x.dtype)


class MTLayerNorm(nn.Module):
    """std-based LayerNorm, eps on std (reference :49)."""
    d_model: int
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones,
                           (self.d_model,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros,
                          (self.d_model,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        std = jnp.std(x32, axis=-1, keepdims=True, ddof=1)
        out = gamma * (x32 - mean) / (std + self.eps) + beta
        return out.astype(self.dtype)


class MTMultiHead(nn.Module):
    """Multi-head via feature chunking, no-bias projections (ref :94)."""
    d_model: int
    n_heads: int
    drop_ratio: float
    causal: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, *, deterministic: bool = True):
        dense = lambda nm: nn.Dense(  # noqa: E731
            self.d_model, use_bias=False,
            kernel_init=nn.initializers.lecun_normal(), dtype=self.dtype,
            param_dtype=jnp.float32, name=nm)
        q, k, v = dense("wq")(query), dense("wk")(key), dense("wv")(value)
        b, lq, _ = q.shape
        lk = k.shape[1]
        d_head = self.d_model // self.n_heads
        q = q.reshape(b, lq, self.n_heads, d_head)
        k = k.reshape(b, lk, self.n_heads, d_head)
        v = v.reshape(b, lk, self.n_heads, d_head)
        from coot_videotext_tpu.models.attention import einsum_f32
        dots = einsum_f32("bqhd,bkhd->bhqk", q, k)
        if self.causal:
            tri = jnp.triu(jnp.full((lk, lk), MT_INF, jnp.float32), k=1)
            dots = dots - tri[None, None]
        # NOTE reference scales AFTER the causal subtraction (:88-90)
        probs = jax.nn.softmax(dots / math.sqrt(d_head * self.n_heads),
                               axis=-1).astype(self.dtype)
        probs = Dropout(rate=self.drop_ratio)(
            probs, deterministic=deterministic)
        out = einsum_f32("bhqk,bkhd->bqhd", probs, v).astype(self.dtype)
        return dense("wo")(out.reshape(b, lq, self.d_model))


class MTResidualBlock(nn.Module):
    """x + dropout(layer(x)) -> LN (reference :62)."""
    d_model: int
    drop_ratio: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, residual, sublayer_out, *,
                 deterministic: bool = True):
        h = Dropout(rate=self.drop_ratio)(
            sublayer_out, deterministic=deterministic)
        return MTLayerNorm(self.d_model, dtype=self.dtype,
                           name="layernorm")(residual + h)


class MTFeedForward(nn.Module):
    d_model: int
    d_hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.d_hidden, dtype=self.dtype,
                     param_dtype=jnp.float32, name="linear1")(x)
        return nn.Dense(self.d_model, dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name="linear2")(nn.relu(h))


class MTEncoderLayer(nn.Module):
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        att = MTMultiHead(cfg.hidden_size, cfg.num_attention_heads,
                          cfg.hidden_dropout_prob, causal=False,
                          dtype=self.dtype, name="selfattn")(
            x, x, x, deterministic=deterministic)
        x = MTResidualBlock(cfg.hidden_size, cfg.hidden_dropout_prob,
                            self.dtype, name="res_attn")(
            x, att, deterministic=deterministic)
        ff = MTFeedForward(cfg.hidden_size, cfg.intermediate_size,
                           self.dtype, name="feedforward")(x)
        return MTResidualBlock(cfg.hidden_size, cfg.hidden_dropout_prob,
                               self.dtype, name="res_ff")(
            x, ff, deterministic=deterministic)


class MTDecoderLayer(nn.Module):
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoding, *, deterministic: bool = True):
        cfg = self.cfg
        att = MTMultiHead(cfg.hidden_size, cfg.num_attention_heads,
                          cfg.hidden_dropout_prob, causal=True,
                          dtype=self.dtype, name="selfattn")(
            x, x, x, deterministic=deterministic)
        x = MTResidualBlock(cfg.hidden_size, cfg.hidden_dropout_prob,
                            self.dtype, name="res_self")(
            x, att, deterministic=deterministic)
        cross = MTMultiHead(cfg.hidden_size, cfg.num_attention_heads,
                            cfg.hidden_dropout_prob, causal=False,
                            dtype=self.dtype, name="attention")(
            x, encoding, encoding, deterministic=deterministic)
        x = MTResidualBlock(cfg.hidden_size, cfg.hidden_dropout_prob,
                            self.dtype, name="res_cross")(
            x, cross, deterministic=deterministic)
        ff = MTFeedForward(cfg.hidden_size, cfg.intermediate_size,
                           self.dtype, name="feedforward")(x)
        return MTResidualBlock(cfg.hidden_size, cfg.hidden_dropout_prob,
                               self.dtype, name="res_ff")(
            x, ff, deterministic=deterministic)


class MTransformer(nn.Module):
    """Vanilla masked transformer (reference MTransformer :220)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        cfg = self.cfg
        self.video_ln = MTLayerNorm(cfg.video_feature_size,
                                    dtype=self.dtype)
        self.video_fc = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                 param_dtype=jnp.float32)
        self.enc_layers = [MTEncoderLayer(cfg, self.dtype,
                                          name=f"enc_layer_{i}")
                           for i in range(cfg.num_hidden_layers)]
        self.dec_layers = [MTDecoderLayer(cfg, self.dtype,
                                          name=f"dec_layer_{i}")
                           for i in range(cfg.num_hidden_layers)]
        self.out_kernel = self.param(
            "out_kernel", nn.initializers.lecun_normal(),
            (cfg.hidden_size, cfg.vocab_size), jnp.float32)
        self.out_bias = self.param("out_bias", nn.initializers.zeros,
                                   (cfg.vocab_size,), jnp.float32)
        self.drop = Dropout(rate=cfg.hidden_dropout_prob)

    def encode(self, video_features, video_masks, *,
               deterministic: bool = True) -> List[jnp.ndarray]:
        x = video_features.astype(self.dtype)
        x = self.video_ln(x)
        x = self.drop(x, deterministic=deterministic)
        x = self.video_fc(x)
        x = x + positional_encodings_like(x)[None]
        x = self.drop(x, deterministic=deterministic)
        mask = video_masks.astype(self.dtype)[..., None]
        x = x * mask
        encodings = []
        for layer in self.enc_layers:
            x = layer(x, deterministic=deterministic)
            x = x * mask
            encodings.append(x)
        return encodings

    def decode(self, text_input_ids, _text_masks, text_input_labels,
               encodings, _video_masks, *, deterministic: bool = True):
        cfg = self.cfg
        # tied embedding = out weight * sqrt(d) (reference :211)
        emb_matrix = (self.out_kernel.T
                      * math.sqrt(cfg.hidden_size)).astype(self.dtype)
        x = emb_matrix[text_input_ids]
        x = x + positional_encodings_like(x)[None]
        x = self.drop(x, deterministic=deterministic)
        for layer, enc in zip(self.dec_layers, encodings):
            x = layer(x, enc, deterministic=deterministic)
        scores = x @ self.out_kernel.astype(self.dtype) \
            + self.out_bias.astype(self.dtype)
        loss = None
        if text_input_labels is not None:
            if cfg.label_smoothing > 0:
                loss = label_smoothing_loss(scores, text_input_labels,
                                            cfg.label_smoothing,
                                            cfg.vocab_size)
            else:
                loss = cross_entropy_loss(scores, text_input_labels)
        return loss, scores

    def __call__(self, video_features, video_masks, text_input_ids,
                 text_masks, text_input_labels, *,
                 deterministic: bool = True):
        encodings = self.encode(video_features, video_masks,
                                deterministic=deterministic)
        return self.decode(text_input_ids, text_masks, text_input_labels,
                           encodings, None, deterministic=deterministic)
