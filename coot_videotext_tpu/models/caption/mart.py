"""
MART captioning models: RecursiveTransformer (memory-augmented recurrent
decoder) and the single-sentence NonRecurTransformer.

Parity with reference mart/model.py:1385 (RecursiveTransformer) and :1334
(NonRecurTransformer). The recursive forward loops over sentence steps
carrying per-layer memory states; steps arrive STACKED as (S, N, L, ...)
arrays (static S = padded max_n_sen; dummy steps carry IGNORE labels and
contribute exactly zero loss), so the whole multi-step forward jits as one
program. The loop is a Python unroll (S and the 2-layer stack are tiny;
unrolling lets XLA fuse across steps; a lax.scan variant would re-trace the
memory-init branch anyway since step 0 differs).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from coot_videotext_tpu.models.caption.bert import (
    BertEmbeddingsWithVideo, BertEncoderNoMemory, BertEncoderWithMemory,
    BertLMPredictionHead)
from coot_videotext_tpu.train.loss_caption import (
    cross_entropy_loss, label_smoothing_loss)

Dtype = Any


class RecursiveTransformer(nn.Module):
    """The MART model (reference :1385)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        self.embeddings = BertEmbeddingsWithVideo(self.cfg, self.dtype,
                                                  add_position_embeddings=True)
        self.encoder = BertEncoderWithMemory(self.cfg, self.dtype)
        self.decoder = BertLMPredictionHead(self.cfg, self.dtype)

    def _embedding_matrix(self) -> Optional[jnp.ndarray]:
        if not self.cfg.share_wd_cls_weight:
            return None
        return self.embeddings.variables["params"]["word_embeddings"][
            "embedding"]

    def forward_step(self, prev_ms: List[Optional[jnp.ndarray]],
                     input_ids: jnp.ndarray, video_features: jnp.ndarray,
                     input_masks: jnp.ndarray,
                     token_type_ids: jnp.ndarray, *,
                     deterministic: bool = True):
        """Single recursive step (reference :1415)."""
        emb = self.embeddings(input_ids, video_features, token_type_ids,
                              deterministic=deterministic)
        prev_ms, encoded = self.encoder(prev_ms, emb, input_masks,
                                        deterministic=deterministic)
        scores = self.decoder(encoded, self._embedding_matrix())
        return prev_ms, encoded, scores

    def __call__(self, input_ids_list, video_features_list,
                 input_masks_list, token_type_ids_list,
                 input_labels_list=None, *, deterministic: bool = True,
                 return_memory: bool = False):
        """
        Args:
            *_list: stacked (S, N, L[, D]) arrays or python lists of
                (N, L[, D]) arrays — one entry per sentence step.

        Returns (caption_loss, prediction_scores_list) or the memory list
        when return_memory (reference :1427-1464).
        """
        step_size = len(input_ids_list)
        prev_ms: List[Optional[jnp.ndarray]] = \
            [None] * self.cfg.num_hidden_layers
        memory_list = []
        scores_list = []
        for idx in range(step_size):
            prev_ms, _, scores = self.forward_step(
                prev_ms, input_ids_list[idx], video_features_list[idx],
                input_masks_list[idx], token_type_ids_list[idx],
                deterministic=deterministic)
            memory_list.append(prev_ms)
            scores_list.append(scores)
        if return_memory:
            return memory_list
        caption_loss = jnp.float32(0.0)
        for idx in range(step_size):
            caption_loss = caption_loss + self.compute_loss(
                scores_list[idx], input_labels_list[idx])
        return caption_loss, scores_list

    def compute_loss(self, scores, labels):
        if self.cfg.label_smoothing != 0:
            return label_smoothing_loss(scores, labels,
                                        self.cfg.label_smoothing,
                                        self.cfg.vocab_size)
        return cross_entropy_loss(scores, labels)


class NonRecurTransformer(nn.Module):
    """Single joint-sequence encoder model (reference :1334)."""
    cfg: Any
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        self.embeddings = BertEmbeddingsWithVideo(self.cfg, self.dtype,
                                                  add_position_embeddings=True)
        self.encoder = BertEncoderNoMemory(self.cfg, self.dtype)
        self.decoder = BertLMPredictionHead(self.cfg, self.dtype)

    def _embedding_matrix(self) -> Optional[jnp.ndarray]:
        if not self.cfg.share_wd_cls_weight:
            return None
        return self.embeddings.variables["params"]["word_embeddings"][
            "embedding"]

    def encode_decode(self, input_ids, video_features, input_masks,
                      token_type_ids, *, deterministic: bool = True):
        emb = self.embeddings(input_ids, video_features, token_type_ids,
                              deterministic=deterministic)
        encoded = self.encoder(emb, input_masks,
                               deterministic=deterministic)
        return self.decoder(encoded, self._embedding_matrix())

    def __call__(self, input_ids, video_features, input_masks,
                 token_type_ids, input_labels=None, *,
                 deterministic: bool = True):
        scores = self.encode_decode(input_ids, video_features, input_masks,
                                    token_type_ids,
                                    deterministic=deterministic)
        if input_labels is None:
            return None, scores
        if self.cfg.label_smoothing != 0:
            loss = label_smoothing_loss(scores, input_labels,
                                        self.cfg.label_smoothing,
                                        self.cfg.vocab_size)
        else:
            loss = cross_entropy_loss(scores, input_labels)
        return loss, scores
