"""
Untied encoder-decoder captioning model: separate video encoder + causal
text decoder with cross-attention.

Parity with reference mart/model.py: BertEmbeddingsTextUntied (:560),
BertEmbeddingsVideoUntied (:567), BertLayerNoMemoryUntied /
BertEncoderNoMemoryUntied (:600-647), BertDecoderLayerNoMemoryUntied /
BertDecoderNoMemoryUntied (:649-722), NonRecurTransformerUntied (:1261).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from coot_videotext_tpu.models.layers import Dropout

from coot_videotext_tpu.models.caption.bert import (
    BertAttention, BertIntermediate, BertLMPredictionHead, BertOutput,
    BertSelfAttention, bert_dense, bert_layernorm,
    positional_encoding_table)
from coot_videotext_tpu.train.loss_caption import (
    cross_entropy_loss, label_smoothing_loss)

Dtype = Any


class BertEmbeddingsTextUntied(nn.Module):
    """Word embedding -> LN/dropout/FC/relu/LN -> sincos PE (ref :560)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text_input_ids, *, deterministic: bool = True):
        cfg = self.cfg
        w = nn.Embed(cfg.vocab_size, cfg.word_vec_size,
                     embedding_init=nn.initializers.normal(
                         cfg.initializer_range),
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="word_embeddings")(text_input_ids)
        w = bert_layernorm(cfg, dtype=self.dtype, name="word_ln_in")(w)
        w = Dropout(rate=cfg.hidden_dropout_prob)(
            w, deterministic=deterministic)
        w = bert_dense(cfg, cfg.hidden_size, dtype=self.dtype,
                       name="word_fc")(w)
        w = nn.relu(w)
        w = bert_layernorm(cfg, dtype=self.dtype, name="word_ln_out")(w)
        pe = positional_encoding_table(cfg.max_position_embeddings,
                                       cfg.hidden_size)
        return w + jnp.asarray(pe[:w.shape[-2]], self.dtype)[None]


class BertEmbeddingsVideoUntied(nn.Module):
    """Video FC pipeline -> sincos PE (ref :567)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video_features, *, deterministic: bool = True):
        cfg = self.cfg
        v = video_features.astype(self.dtype)
        v = bert_layernorm(cfg, dtype=self.dtype, name="video_ln_in")(v)
        v = Dropout(rate=cfg.hidden_dropout_prob)(
            v, deterministic=deterministic)
        v = bert_dense(cfg, cfg.hidden_size, dtype=self.dtype,
                       name="video_fc")(v)
        v = nn.relu(v)
        v = bert_layernorm(cfg, dtype=self.dtype, name="video_ln_out")(v)
        pe = positional_encoding_table(cfg.max_position_embeddings,
                                       cfg.hidden_size)
        return v + jnp.asarray(pe[:v.shape[-2]], self.dtype)[None]


def _self_mask(attention_mask: jnp.ndarray,
               diagonal_mask: bool) -> jnp.ndarray:
    """(N, L) -> (N, L, L) key mask, optionally causal (ref :640-645)."""
    mask = attention_mask.astype(jnp.float32)[:, None, :]
    if diagonal_mask:
        max_len = attention_mask.shape[1]
        tril = jnp.tril(jnp.ones((max_len, max_len), jnp.float32))
        mask = mask * tril[None]
    return jnp.broadcast_to(mask, (attention_mask.shape[0],
                                   attention_mask.shape[1],
                                   attention_mask.shape[1]))


class BertLayerNoMemoryUntied(nn.Module):
    """Encoder layer (ref :600)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, attention_mask,
                 diagonal_mask: bool = False, *,
                 deterministic: bool = True):
        mask = _self_mask(attention_mask, diagonal_mask)
        att = BertAttention(self.cfg, self.dtype, name="attention")(
            hidden_states, mask, deterministic=deterministic)
        inter = BertIntermediate(self.cfg, self.dtype,
                                 name="hidden_intermediate")(att)
        return BertOutput(self.cfg, self.dtype, name="output")(
            inter, att, deterministic=deterministic)


class BertEncoderNoMemoryUntied(nn.Module):
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, attention_mask,
                 diagonal_mask: bool = False, *,
                 deterministic: bool = True):
        for i in range(self.cfg.num_hidden_layers):
            hidden_states = BertLayerNoMemoryUntied(
                self.cfg, self.dtype, name=f"layer_{i}")(
                hidden_states, attention_mask, diagonal_mask,
                deterministic=deterministic)
        return hidden_states


class BertDecoderLayerNoMemoryUntied(nn.Module):
    """Decoder layer: causal self-attn + cross-attn (ref :649)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, dec_hidden_states, dec_mask, enc_outputs, enc_mask,
                 diagonal_mask: bool = True, *,
                 deterministic: bool = True):
        cfg = self.cfg
        self_mask = _self_mask(dec_mask, diagonal_mask)
        att = BertSelfAttention(cfg, self.dtype, name="self_attention")(
            dec_hidden_states, dec_hidden_states, dec_hidden_states,
            self_mask, deterministic=deterministic)
        att = bert_layernorm(cfg, dtype=self.dtype, name="norm1")(
            att + dec_hidden_states)
        enc_key_mask = jnp.broadcast_to(
            enc_mask.astype(jnp.float32)[:, None, :],
            (dec_mask.shape[0], dec_mask.shape[1], enc_mask.shape[1]))
        cross = BertSelfAttention(cfg, self.dtype,
                                  name="dec_enc_attention")(
            att, enc_outputs, enc_outputs, enc_key_mask,
            deterministic=deterministic)
        cross = bert_layernorm(cfg, dtype=self.dtype, name="norm2")(
            att + cross)
        # reference :679: output applied with residual onto ITSELF
        return BertOutput(cfg, self.dtype, name="output")(
            cross, cross, deterministic=deterministic)


class BertDecoderNoMemoryUntied(nn.Module):
    cfg: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, dec_hidden_states, dec_mask, enc_outputs, enc_mask,
                 *, deterministic: bool = True):
        for i in range(self.cfg.num_hidden_layers):
            dec_hidden_states = BertDecoderLayerNoMemoryUntied(
                self.cfg, self.dtype, name=f"layer_{i}")(
                dec_hidden_states, dec_mask, enc_outputs, enc_mask,
                diagonal_mask=True, deterministic=deterministic)
        return dec_hidden_states


class NonRecurTransformerUntied(nn.Module):
    """Untied encoder-decoder model (reference :1261)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        self.embeddings = BertEmbeddingsTextUntied(self.cfg, self.dtype)
        self.video_embeddings = BertEmbeddingsVideoUntied(self.cfg,
                                                          self.dtype)
        self.encoder = BertEncoderNoMemoryUntied(self.cfg, self.dtype)
        self.decoder = BertDecoderNoMemoryUntied(self.cfg, self.dtype)
        self.decoder_classifier = BertLMPredictionHead(self.cfg,
                                                       self.dtype)

    def encode(self, video_features, video_masks, *,
               deterministic: bool = True):
        v = self.video_embeddings(video_features,
                                  deterministic=deterministic)
        return self.encoder(v, video_masks, False,
                            deterministic=deterministic)

    def decode(self, text_input_ids, text_masks, text_input_labels,
               encoder_outputs, encoder_masks, *,
               deterministic: bool = True):
        t = self.embeddings(text_input_ids, deterministic=deterministic)
        dec = self.decoder(t, text_masks, encoder_outputs, encoder_masks,
                           deterministic=deterministic)
        scores = self.decoder_classifier(dec, None)
        loss = None
        if text_input_labels is not None:
            if self.cfg.label_smoothing > 0:
                loss = label_smoothing_loss(scores, text_input_labels,
                                            self.cfg.label_smoothing,
                                            self.cfg.vocab_size)
            else:
                loss = cross_entropy_loss(scores, text_input_labels)
        return loss, scores

    def __call__(self, video_features, video_masks, text_input_ids,
                 text_masks, text_input_labels, *,
                 deterministic: bool = True):
        enc = self.encode(video_features, video_masks,
                          deterministic=deterministic)
        return self.decode(text_input_ids, text_masks, text_input_labels,
                           enc, video_masks, deterministic=deterministic)
