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
        use_scan = (bool(getattr(self.cfg, "recurrent_scan", False))
                    and not return_memory and step_size > 1
                    and isinstance(input_ids_list, jnp.ndarray))
        if use_scan:
            return self._forward_scan(
                input_ids_list, video_features_list, input_masks_list,
                token_type_ids_list, input_labels_list,
                deterministic=deterministic)
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

    def _forward_scan(self, input_ids_list, video_features_list,
                      input_masks_list, token_type_ids_list,
                      input_labels_list, *, deterministic: bool):
        """lax.scan alternative to the unrolled step loop (opt-in via
        config `recurrent_scan`): step 0 runs unrolled (it takes the
        MemoryInitializer branch, a different graph), steps 1..S-1
        compile ONCE as a scanned body instead of S-1 traced copies —
        the compile-time lever for large max_n_sen. Same math per step;
        deterministic outputs match the unroll to float tolerance.
        Training differs only in the per-step dropout streams (nn.scan
        folds the step index into the rng instead of the module call
        counter), so seeded trajectories are not bit-comparable with
        unrolled runs — keep one setting per experiment."""
        import jax
        from flax import linen as nn

        prev_ms, _, scores0 = self.forward_step(
            [None] * self.cfg.num_hidden_layers, input_ids_list[0],
            video_features_list[0], input_masks_list[0],
            token_type_ids_list[0], deterministic=deterministic)

        def body(mdl, carry, xs):
            ids, feats, masks, ttys = xs
            new_ms, _, scores = mdl.forward_step(
                list(carry), ids, feats, masks, ttys,
                deterministic=deterministic)
            return tuple(new_ms), scores

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"dropout": True},
                       in_axes=0, out_axes=0)
        _, scores_rest = scan(
            self, tuple(prev_ms),
            (input_ids_list[1:], video_features_list[1:],
             input_masks_list[1:], token_type_ids_list[1:]))

        caption_loss = self.compute_loss(scores0, input_labels_list[0])
        caption_loss = caption_loss + jnp.sum(
            jax.vmap(self.compute_loss)(scores_rest,
                                        input_labels_list[1:]))
        scores_list = [scores0] + [scores_rest[i]
                                   for i in range(scores_rest.shape[0])]
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
