"""
TransformerXL captioning variant: relative-position attention with
cross-segment memory.

Parity with reference mart/model.py:864-1260 (PositionwiseFF,
RelPartialLearnableMultiHeadAttn with _rel_shift :914, TransformerXLEncoder
:1081, memory = previous-segment hidden states, detached unless xl_grad
:1098, TransformerXL :1147). Implemented batch-first (N, L, D) — the
einsums mirror the reference's (L, N, D) math exactly. The r_w/r_r biases
are initialized normal(initializer_range) (the reference leaves them as
uninitialized torch.Tensor memory — not reproducible).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from coot_videotext_tpu.models.layers import Dropout

from coot_videotext_tpu.models.caption.bert import (
    BertEmbeddingsWithVideo, BertLMPredictionHead, make_shifted_mask)
from coot_videotext_tpu.train.loss_caption import (
    cross_entropy_loss, label_smoothing_loss)
from coot_videotext_tpu.typext import INF

Dtype = Any


def positional_embedding_xl(pos_seq: jnp.ndarray,
                            d_model: int) -> jnp.ndarray:
    """Sinusoid embedding of a (K,) position sequence -> (K, D)
    (reference PositionalEmbeddingXL)."""
    inv_freq = 1.0 / (10000 ** (np.arange(0.0, d_model, 2.0) / d_model))
    sinusoid = pos_seq[:, None] * jnp.asarray(inv_freq, pos_seq.dtype)[None]
    return jnp.concatenate([jnp.sin(sinusoid), jnp.cos(sinusoid)], axis=-1)


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Relative shift along the key axis, batch-first (N, H, Lq, K)
    (reference _rel_shift :914)."""
    n, h, q, k = x.shape
    zero_pad = jnp.zeros((n, h, q, 1), x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)  # (N, H, Q, K+1)
    x_padded = x_padded.reshape(n, h, k + 1, q)
    return x_padded[:, :, 1:, :].reshape(n, h, q, k)


class PositionwiseFF(nn.Module):
    """FFN with post-LN (reference :855, pre_lnorm=False)."""
    d_model: int
    d_inner: int
    dropout: float
    init_std: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inp, *, deterministic: bool = True):
        kinit = nn.initializers.normal(self.init_std)
        h = nn.Dense(self.d_inner, kernel_init=kinit,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(inp)
        h = nn.relu(h)
        h = Dropout(rate=self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, kernel_init=kinit,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(h)
        h = Dropout(rate=self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name="layer_norm")(inp + h)


class RelPartialLearnableMultiHeadAttn(nn.Module):
    """Relative-position MHA (reference :936)."""
    n_head: int
    d_model: int
    d_head: int
    dropout: float
    init_std: float
    dropatt: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, w, r, r_w_bias, r_r_bias, attn_mask=None,
                 mems: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True):
        """
        Args:
            w: (N, L, D) input; r: (K, D) relative pos embedding
            r_w_bias / r_r_bias: (H, Dh)
            attn_mask: (N, L, K) with 1 = MASKED (reference convention)
            mems: (N, M, D) or None
        """
        kinit = nn.initializers.normal(self.init_std)
        qkv = nn.Dense(3 * self.n_head * self.d_head, use_bias=False,
                       kernel_init=kinit, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv_net")
        r_net = nn.Dense(self.n_head * self.d_head, use_bias=False,
                         kernel_init=kinit, dtype=self.dtype,
                         param_dtype=jnp.float32, name="r_net")
        o_net = nn.Dense(self.d_model, use_bias=False, kernel_init=kinit,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="o_net")

        n, qlen, _ = w.shape
        cat = w if mems is None else jnp.concatenate([mems, w], axis=1)
        heads = qkv(cat)  # (N, K, 3*H*Dh)
        klen = heads.shape[1]
        q, k, v = jnp.split(heads, 3, axis=-1)
        q = q[:, -qlen:]
        q = q.reshape(n, qlen, self.n_head, self.d_head)
        k = k.reshape(n, klen, self.n_head, self.d_head)
        v = v.reshape(n, klen, self.n_head, self.d_head)
        r_head_k = r_net(r).reshape(-1, self.n_head, self.d_head)  # (K,H,Dh)

        from coot_videotext_tpu.models.attention import einsum_f32
        rw_q = q + r_w_bias.astype(q.dtype)[None, None]
        AC = einsum_f32("bqhd,bkhd->bhqk", rw_q, k)
        rr_q = q + r_r_bias.astype(q.dtype)[None, None]
        BD = jnp.einsum("bqhd,khd->bhqk", rr_q.astype(jnp.float32),
                        r_head_k.astype(jnp.float32))
        BD = rel_shift(BD)
        score = (AC + BD) * (1.0 / self.d_head ** 0.5)  # (N,H,Q,K) f32
        if attn_mask is not None:
            score = jnp.where(attn_mask.astype(bool)[:, None], -INF,
                              score)
        prob = jax.nn.softmax(score, axis=-1).astype(self.dtype)
        prob = Dropout(rate=self.dropatt)(prob,
                                             deterministic=deterministic)
        vec = einsum_f32("bhqk,bkhd->bqhd", prob, v).astype(self.dtype)
        vec = vec.reshape(n, qlen, self.n_head * self.d_head)
        out = o_net(vec)
        out = Dropout(rate=self.dropout)(out,
                                            deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name="layer_norm")(w + out)


class RelPartialLearnableDecoderLayer(nn.Module):
    """Attention + FFN (reference :1040)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, dec_inp, r, r_w_bias, r_r_bias, dec_attn_mask=None,
                 mems=None, *, deterministic: bool = True):
        cfg = self.cfg
        d_head = cfg.hidden_size // cfg.num_attention_heads
        out = RelPartialLearnableMultiHeadAttn(
            cfg.num_attention_heads, cfg.hidden_size, d_head,
            cfg.hidden_dropout_prob, cfg.initializer_range,
            dropatt=0.0, dtype=self.dtype, name="dec_attn")(
            dec_inp, r, r_w_bias, r_r_bias, attn_mask=dec_attn_mask,
            mems=mems, deterministic=deterministic)
        return PositionwiseFF(cfg.hidden_size, cfg.hidden_size,
                              cfg.hidden_dropout_prob,
                              cfg.initializer_range, dtype=self.dtype,
                              name="pos_ff")(
            out, deterministic=deterministic)


class TransformerXLEncoder(nn.Module):
    """Layer stack threading per-layer memory (reference :1081)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mems: Optional[List[jnp.ndarray]], raw_embeddings,
                 attention_mask, *, deterministic: bool = True):
        """
        Args:
            mems: [ (N, L, D) ] * (n_layers + 1) or None (first step)
            raw_embeddings: (N, L, D)
            attention_mask: (N, L, K) with 1 = masked
        Returns (last_layer_output, new_mems).
        """
        cfg = self.cfg
        d_head = cfg.hidden_size // cfg.num_attention_heads
        r_w_bias = self.param("r_w_bias",
                              nn.initializers.normal(
                                  cfg.initializer_range),
                              (cfg.num_attention_heads, d_head),
                              jnp.float32)
        r_r_bias = self.param("r_r_bias",
                              nn.initializers.normal(
                                  cfg.initializer_range),
                              (cfg.num_attention_heads, d_head),
                              jnp.float32)

        qlen = raw_embeddings.shape[1]
        mlen = mems[0].shape[1] if mems is not None else 0
        klen = mlen + qlen
        pos_seq = jnp.arange(klen - 1, -1, -1.0, dtype=jnp.float32)
        pos_emb = positional_embedding_xl(pos_seq, cfg.hidden_size)

        drop = Dropout(rate=cfg.hidden_dropout_prob)
        core_out = drop(raw_embeddings.astype(self.dtype),
                        deterministic=deterministic)
        pos_emb = drop(pos_emb.astype(self.dtype),
                       deterministic=deterministic)

        hids = [core_out]
        for i in range(cfg.num_hidden_layers):
            mems_i = None if mems is None else mems[i]
            core_out = RelPartialLearnableDecoderLayer(
                cfg, self.dtype, name=f"layer_{i}")(
                core_out, pos_emb, r_w_bias, r_r_bias,
                dec_attn_mask=attention_mask, mems=mems_i,
                deterministic=deterministic)
            hids.append(core_out)
        core_out = drop(core_out, deterministic=deterministic)

        if self.cfg.xl_grad:
            new_mems = list(hids)
        else:
            new_mems = [jax.lax.stop_gradient(h) for h in hids]
        return core_out, new_mems


class TransformerXL(nn.Module):
    """XL captioning model (reference :1147)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        # positional information comes from the relative attention
        self.embeddings = BertEmbeddingsWithVideo(
            self.cfg, self.dtype, add_position_embeddings=False)
        self.encoder = TransformerXLEncoder(self.cfg, self.dtype)
        self.decoder = BertLMPredictionHead(self.cfg, self.dtype)

    def make_mask(self, input_mask, prev_seg_input_masks=None):
        """(N, L[, 2L]) mask with 1 = MASKED (reference :1190)."""
        cfg = self.cfg
        subsequent = make_shifted_mask(input_mask, cfg.max_v_len,
                                       cfg.max_t_len, memory_len=0)
        attn_mask2 = subsequent * input_mask.astype(jnp.float32)[:, None]
        if prev_seg_input_masks is None:
            attn_mask = attn_mask2
        else:
            attn_mask1 = jnp.broadcast_to(
                prev_seg_input_masks.astype(jnp.float32)[:, None, :],
                attn_mask2.shape)
            attn_mask = jnp.concatenate([attn_mask1, attn_mask2], axis=2)
        return 1.0 - attn_mask  # (N, L, K), 1 = masked

    def forward_step(self, prev_ms, input_ids, video_features,
                     token_type_ids, input_masks, prev_masks, *,
                     deterministic: bool = True):
        emb = self.embeddings(input_ids, video_features, token_type_ids,
                              deterministic=deterministic)
        attn_mask = self.make_mask(input_masks, prev_masks)
        last_out, new_ms = self.encoder(prev_ms, emb, attn_mask,
                                        deterministic=deterministic)
        scores = self.decoder(last_out, None)
        return new_ms, last_out, scores

    def __call__(self, input_ids_list, video_features_list,
                 input_masks_list, token_type_ids_list,
                 input_labels_list=None, *, deterministic: bool = True):
        step_size = len(input_ids_list)
        prev_ms = None
        scores_list = []
        for idx in range(step_size):
            prev_masks = None if idx == 0 else input_masks_list[idx - 1]
            prev_ms, _, scores = self.forward_step(
                prev_ms, input_ids_list[idx], video_features_list[idx],
                token_type_ids_list[idx], input_masks_list[idx],
                prev_masks, deterministic=deterministic)
            scores_list.append(scores)
        caption_loss = jnp.float32(0.0)
        for idx in range(step_size):
            if self.cfg.label_smoothing > 0:
                caption_loss = caption_loss + label_smoothing_loss(
                    scores_list[idx], input_labels_list[idx],
                    self.cfg.label_smoothing, self.cfg.vocab_size)
            else:
                caption_loss = caption_loss + cross_entropy_loss(
                    scores_list[idx], input_labels_list[idx])
        return caption_loss, scores_list
