"""
BERT-style building blocks shared by the MART captioning model family.

Numerical parity with reference mart/model.py:
    - TF-style LayerNorm (biased variance, eps inside sqrt, :147) == flax
      nn.LayerNorm with the same eps.
    - additive attention mask (1-mask)*-10000 (:198) — NOT the -INF fill the
      COOT side uses; kept different deliberately for parity.
    - exact-erf gelu (:97), sincos PositionEncoding added to the summed
      embeddings (:108), video+word+token-type embedding sum (:458),
      prediction head with optional tied decoder matrix (:802).
    - shifted masks: video prefix fully visible, text suffix causal,
      memory prefix visible (make_shifted_mask :286, make_pad_shifted_mask
      :316) — built with static broadcasted_iota instead of in-place writes.
    - memory: masked mean-pool init with learned bias (:724), GRU-style
      z/c-gated update from attention over states (:751).

All weights init normal(0, initializer_range), biases zero, LN ones/zeros
(reference init_bert_weights :1401-1413).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from coot_videotext_tpu.models.layers import Dropout

Dtype = Any


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact erf gelu (reference model.py:97)."""
    return jax.nn.gelu(x, approximate=False)


def bert_dense(cfg, features: int, *, use_bias: bool = True,
               dtype=jnp.float32, name: Optional[str] = None) -> nn.Dense:
    return nn.Dense(
        features, use_bias=use_bias,
        kernel_init=nn.initializers.normal(cfg.initializer_range),
        bias_init=nn.initializers.zeros, dtype=dtype,
        param_dtype=jnp.float32, name=name)


def bert_layernorm(cfg, *, dtype=jnp.float32,
                   name: Optional[str] = None) -> nn.LayerNorm:
    """TF-style LayerNorm (reference BertLayerNorm :147)."""
    return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                        param_dtype=jnp.float32, name=name)


def positional_encoding_table(max_len: int, dim: int) -> np.ndarray:
    """Sincos table (reference PositionEncoding :108-131)."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float32)
                      * (-np.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


# ---------- masks ----------

def make_shifted_mask(input_mask: jnp.ndarray, max_v_len: int,
                      max_t_len: int, memory_len: int = 0) -> jnp.ndarray:
    """
    (N, L) -> (N, max_v_len+max_t_len, M+L) float mask: memory+video columns
    always visible, text columns causal (reference :286). Built from iota
    comparisons (static shapes, no scatter).
    """
    bsz, seq_len = input_mask.shape
    assert max_v_len + max_t_len + memory_len == seq_len
    n_rows = max_v_len + max_t_len
    row = jax.lax.broadcasted_iota(jnp.int32, (n_rows, seq_len), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n_rows, seq_len), 1)
    always = col < memory_len + max_v_len
    # causal among text: row i (i >= max_v_len) sees text cols j with
    # j - (memory_len + max_v_len) <= i - max_v_len
    causal = (row >= max_v_len) & (col - memory_len <= row)
    mask = (always | causal).astype(jnp.float32)
    return jnp.broadcast_to(mask[None], (bsz, n_rows, seq_len))


def make_pad_shifted_mask(input_mask: jnp.ndarray, max_v_len: int,
                          max_t_len: int, memory_len: int = 0
                          ) -> jnp.ndarray:
    """Shifted mask * padding mask (reference :316)."""
    shifted = make_shifted_mask(input_mask, max_v_len, max_t_len,
                                memory_len=memory_len)
    return shifted * input_mask.astype(jnp.float32)[:, None, :]


def make_video_only_mask(input_mask: jnp.ndarray,
                         max_v_len: int) -> jnp.ndarray:
    """Zero out the text suffix (reference :323)."""
    col = jax.lax.broadcasted_iota(jnp.int32, input_mask.shape, 1)
    return jnp.where(col < max_v_len, input_mask, 0)


# ---------- attention ----------

class BertSelfAttention(nn.Module):
    """Multi-head attention with additive -10000 mask (reference :164)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query_states: jnp.ndarray, key_states: jnp.ndarray,
                 value_states: jnp.ndarray, attention_mask: jnp.ndarray, *,
                 deterministic: bool = True) -> jnp.ndarray:
        """
        Args:
            query_states: (N, Lq, D); key/value_states: (N, L, D)
            attention_mask: (N, Lq, L) float/bool, 1 = attend
        """
        cfg = self.cfg
        assert cfg.hidden_size % cfg.num_attention_heads == 0
        d_head = cfg.hidden_size // cfg.num_attention_heads
        n_heads = cfg.num_attention_heads

        add_mask = (1.0 - attention_mask.astype(jnp.float32)[:, None]
                    ) * -10000.0  # (N, 1, Lq, L)
        q = bert_dense(cfg, cfg.hidden_size, dtype=self.dtype,
                       name="query")(query_states)
        k = bert_dense(cfg, cfg.hidden_size, dtype=self.dtype,
                       name="key")(key_states)
        v = bert_dense(cfg, cfg.hidden_size, dtype=self.dtype,
                       name="value")(value_states)
        b, lq, _ = q.shape
        lk = k.shape[1]
        q = q.reshape(b, lq, n_heads, d_head)
        k = k.reshape(b, lk, n_heads, d_head)
        v = v.reshape(b, lk, n_heads, d_head)

        from coot_videotext_tpu.models.attention import einsum_f32
        scores = einsum_f32("bqhd,bkhd->bhqk", q, k)
        scores = scores / jnp.sqrt(jnp.float32(d_head)) + add_mask
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = Dropout(rate=cfg.attention_probs_dropout_prob)(
            probs, deterministic=deterministic)
        ctx = einsum_f32("bhqk,bkhd->bqhd", probs, v).astype(self.dtype)
        return ctx.reshape(b, lq, cfg.hidden_size)


class BertSelfOutput(nn.Module):
    """Dense -> dropout -> residual LN (reference :230)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, input_tensor, *,
                 deterministic: bool = True):
        h = bert_dense(self.cfg, self.cfg.hidden_size, dtype=self.dtype,
                       name="dense")(hidden_states)
        h = Dropout(rate=self.cfg.hidden_dropout_prob)(
            h, deterministic=deterministic)
        return bert_layernorm(self.cfg, dtype=self.dtype,
                              name="LayerNorm")(h + input_tensor)


class BertAttention(nn.Module):
    """Self-attention block (reference :240)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_tensor, attention_mask, *,
                 deterministic: bool = True):
        self_out = BertSelfAttention(self.cfg, self.dtype, name="self")(
            input_tensor, input_tensor, input_tensor, attention_mask,
            deterministic=deterministic)
        return BertSelfOutput(self.cfg, self.dtype, name="output")(
            self_out, input_tensor, deterministic=deterministic)


class BertIntermediate(nn.Module):
    """Dense + gelu (reference :259)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states):
        h = bert_dense(self.cfg, self.cfg.intermediate_size,
                       dtype=self.dtype, name="dense")(hidden_states)
        return gelu(h)


class BertOutput(nn.Module):
    """Dense -> dropout -> residual LN back to hidden (reference :271)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, input_tensor, *,
                 deterministic: bool = True):
        h = bert_dense(self.cfg, self.cfg.hidden_size, dtype=self.dtype,
                       name="dense")(hidden_states)
        h = Dropout(rate=self.cfg.hidden_dropout_prob)(
            h, deterministic=deterministic)
        return bert_layernorm(self.cfg, dtype=self.dtype,
                              name="LayerNorm")(h + input_tensor)


# ---------- memory ----------

class MemoryInitializer(nn.Module):
    """Masked mean-pool + learned bias -> FC (reference :724)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_states, attention_mask, *,
                 deterministic: bool = True):
        cfg = self.cfg
        mask = attention_mask.astype(jnp.float32)
        pooled = jnp.sum(
            input_states * mask[:, :, None].astype(self.dtype), axis=1)
        pooled = pooled / jnp.sum(mask, axis=1, keepdims=True).astype(
            self.dtype)
        pooled = jnp.repeat(pooled[:, None], cfg.n_memory_cells, axis=1)
        bias = self.param("init_memory_bias",
                          nn.initializers.normal(1.0),
                          (1, cfg.n_memory_cells, 1), jnp.float32)
        pooled = pooled + bias.astype(self.dtype)
        h = bert_dense(cfg, cfg.hidden_size, dtype=self.dtype,
                       name="init_memory_fc")(pooled)
        h = bert_layernorm(cfg, dtype=self.dtype, name="init_memory_ln")(h)
        return Dropout(rate=cfg.memory_dropout_prob)(
            h, deterministic=deterministic)


class MemoryUpdater(nn.Module):
    """Attention over states + GRU-style z/c gates (reference :751)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, prev_m, input_states, attention_mask, *,
                 deterministic: bool = True):
        cfg = self.cfg
        n_cells = prev_m.shape[1]
        update_mask = jnp.repeat(
            attention_mask.astype(jnp.float32)[:, None], n_cells, axis=1)
        s_t = BertSelfAttention(cfg, self.dtype,
                                name="memory_update_attention")(
            prev_m, input_states, input_states, update_mask,
            deterministic=deterministic)
        c_t = jnp.tanh(
            bert_dense(cfg, cfg.hidden_size, use_bias=False,
                       dtype=self.dtype, name="mc")(prev_m)
            + bert_dense(cfg, cfg.hidden_size, dtype=self.dtype,
                         name="sc")(s_t))
        z_t = jax.nn.sigmoid(
            bert_dense(cfg, cfg.hidden_size, use_bias=False,
                       dtype=self.dtype, name="mz")(prev_m)
            + bert_dense(cfg, cfg.hidden_size, dtype=self.dtype,
                         name="sz")(s_t))
        return (1 - z_t) * c_t + z_t * prev_m


# ---------- layers / encoders ----------

class BertLayerNoMemory(nn.Module):
    """Plain joint-sequence layer (reference :334)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, attention_mask, *,
                 deterministic: bool = True):
        cfg = self.cfg
        shifted = make_pad_shifted_mask(attention_mask, cfg.max_v_len,
                                        cfg.max_t_len)
        att = BertAttention(cfg, self.dtype, name="attention")(
            hidden_states, shifted, deterministic=deterministic)
        inter = BertIntermediate(cfg, self.dtype,
                                 name="hidden_intermediate")(att)
        return BertOutput(cfg, self.dtype, name="output")(
            inter, att, deterministic=deterministic)


class BertEncoderNoMemory(nn.Module):
    """Stack of no-memory layers (reference :359)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, attention_mask, *,
                 deterministic: bool = True):
        for i in range(self.cfg.num_hidden_layers):
            hidden_states = BertLayerNoMemory(
                self.cfg, self.dtype, name=f"layer_{i}")(
                hidden_states, attention_mask,
                deterministic=deterministic)
        return hidden_states


class BertLayerWithMemory(nn.Module):
    """Memory-augmented layer (reference :383)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, prev_m: Optional[jnp.ndarray], hidden_states,
                 attention_mask, *, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        shifted = make_pad_shifted_mask(attention_mask, cfg.max_v_len,
                                        cfg.max_t_len)
        att = BertAttention(cfg, self.dtype, name="attention")(
            hidden_states, shifted, deterministic=deterministic)
        inter = BertIntermediate(cfg, self.dtype,
                                 name="hidden_intermediate")(att)

        if prev_m is None:
            # first step: init memory from the video part only (:399-402)
            init_mask = make_video_only_mask(attention_mask, cfg.max_v_len)
            prev_m = MemoryInitializer(cfg, self.dtype,
                                       name="memory_initilizer")(
                inter, init_mask, deterministic=deterministic)

        updated_m = MemoryUpdater(cfg, self.dtype, name="memory_updater")(
            prev_m, inter, attention_mask, deterministic=deterministic)

        concat_mh = jnp.concatenate([prev_m, inter], axis=1)
        bsz, n_cells = prev_m.shape[:2]
        raw_mask = jnp.concatenate(
            [jnp.ones((bsz, n_cells), attention_mask.dtype),
             attention_mask], axis=-1)
        mem_mask = make_pad_shifted_mask(raw_mask, cfg.max_v_len,
                                         cfg.max_t_len,
                                         memory_len=n_cells)
        mem_att = BertSelfAttention(cfg, self.dtype,
                                    name="memory_augmented_attention")(
            inter, concat_mh, concat_mh, mem_mask,
            deterministic=deterministic)
        mem_att = bert_dense(cfg, cfg.hidden_size, dtype=self.dtype,
                             name="memory_projection")(mem_att)
        layer_out = BertOutput(cfg, self.dtype, name="output")(
            mem_att, att, deterministic=deterministic)
        return updated_m, layer_out


class BertEncoderWithMemory(nn.Module):
    """Stack of memory layers threading per-layer memory (reference :433)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, prev_ms, hidden_states, attention_mask, *,
                 deterministic: bool = True):
        """prev_ms: list [ (N, M, D) or None ] * num_hidden_layers."""
        prev_ms = list(prev_ms)
        for i in range(self.cfg.num_hidden_layers):
            prev_ms[i], hidden_states = BertLayerWithMemory(
                self.cfg, self.dtype, name=f"layer_{i}")(
                prev_ms[i], hidden_states, attention_mask,
                deterministic=deterministic)
        return prev_ms, hidden_states


# ---------- embeddings / head ----------

class BertEmbeddingsWithVideo(nn.Module):
    """word + video + token-type embeddings summed, then PE+LN+dropout
    (reference :458)."""
    cfg: Any
    dtype: Dtype = jnp.float32
    add_position_embeddings: bool = True

    @nn.compact
    def __call__(self, input_ids, video_features, token_type_ids, *,
                 deterministic: bool = True):
        cfg = self.cfg
        word_emb = nn.Embed(
            cfg.vocab_size, cfg.word_vec_size,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            dtype=self.dtype, param_dtype=jnp.float32,
            name="word_embeddings")(input_ids)
        w = bert_layernorm(cfg, dtype=self.dtype, name="word_ln_in")(
            word_emb)
        w = Dropout(rate=cfg.hidden_dropout_prob)(
            w, deterministic=deterministic)
        w = bert_dense(cfg, cfg.hidden_size, dtype=self.dtype,
                       name="word_fc")(w)
        w = nn.relu(w)
        w = bert_layernorm(cfg, dtype=self.dtype, name="word_ln_out")(w)

        vf = video_features.astype(self.dtype)
        v = bert_layernorm(cfg, dtype=self.dtype, name="video_ln_in")(vf)
        v = Dropout(rate=cfg.hidden_dropout_prob)(
            v, deterministic=deterministic)
        v = bert_dense(cfg, cfg.hidden_size, dtype=self.dtype,
                       name="video_fc")(v)
        v = nn.relu(v)
        v = bert_layernorm(cfg, dtype=self.dtype, name="video_ln_out")(v)

        t = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            dtype=self.dtype, param_dtype=jnp.float32,
            name="token_type_embeddings")(token_type_ids)

        emb = w + v + t
        if self.add_position_embeddings:
            pe = positional_encoding_table(cfg.max_position_embeddings,
                                           cfg.hidden_size)
            emb = emb + jnp.asarray(pe[:emb.shape[-2]],
                                    self.dtype)[None]
        emb = bert_layernorm(cfg, dtype=self.dtype, name="LayerNorm")(emb)
        return Dropout(rate=cfg.hidden_dropout_prob)(
            emb, deterministic=deterministic)


class BertLMPredictionHead(nn.Module):
    """Transform + (tied or free) decoder matrix + bias (reference :802).
    When share_wd_cls_weight the caller passes the word embedding matrix."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states,
                 embedding_matrix: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        h = bert_dense(cfg, cfg.hidden_size, dtype=self.dtype,
                       name="transform_dense")(hidden_states)
        h = gelu(h)
        h = bert_layernorm(cfg, dtype=self.dtype, name="transform_ln")(h)
        if cfg.share_wd_cls_weight:
            assert embedding_matrix is not None
            logits = h @ embedding_matrix.T.astype(self.dtype)
        else:
            logits = bert_dense(cfg, cfg.vocab_size, use_bias=False,
                                dtype=self.dtype, name="decoder")(h)
        bias = self.param("bias", nn.initializers.zeros,
                          (cfg.vocab_size,), jnp.float32)
        return logits + bias.astype(self.dtype)
