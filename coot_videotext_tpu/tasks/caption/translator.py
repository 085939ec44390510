"""
Caption inference driver (greedy decoding).

Token-for-token parity with reference mart/translator.py:
    - prepare_video_only_inputs blanks all text ids/masks (:424)
    - greedy recurrent (:201): per sentence step, loop dec_idx over the
      text region; each token re-runs the FULL forward_step with the
      previous sentence's memory; UNK suppressed (-1e10); after the
      sentence, tokens after the first [EOS] become [PAD] and one more
      forward builds the next-sentence memory (:231-234)
    - single-sentence greedy mirrors the same loop without memory.

TPU-native execution: the per-sentence token loop is a lax.fori_loop inside
ONE jitted program (the reference's full-recompute-per-token semantics kept
exactly — optimizing to cached decoding is a later perf pass); sentence
steps iterate on host carrying the memory arrays.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from coot_videotext_tpu.data.caption_dataset import (
    BOS, EOS, PAD, UNK, RecursiveCaptionDataset)


def mask_tokens_after_eos(input_ids: jnp.ndarray,
                          input_masks: jnp.ndarray,
                          eos_token_id: int = EOS,
                          pad_token_id: int = PAD):
    """Replace values after the first [EOS] with [PAD]
    (reference translator.py:50), vectorized."""
    is_eos = input_ids == eos_token_id
    has_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)  # 0 when none
    col = jnp.arange(input_ids.shape[1])[None, :]
    after = (col > first_eos[:, None]) & has_eos[:, None]
    input_ids = jnp.where(after, pad_token_id, input_ids)
    input_masks = jnp.where(after, 0, input_masks)
    return input_ids, input_masks


def prepare_video_only_inputs(input_ids, input_masks, segment_ids):
    """Blank text ids and masks (reference :424). Works on stacked
    (S, N, L) or single (N, L) arrays."""
    text_mask = segment_ids == 1
    input_ids = jnp.where(text_mask, PAD, input_ids)
    input_masks = jnp.where(text_mask, 0, input_masks)
    return input_ids, input_masks


class Translator:
    """Greedy/beam inference (reference Translator :67)."""

    def __init__(self, model, params_provider, cfg, logger=None) -> None:
        """
        Args:
            model: flax caption module (RecursiveTransformer / NonRecur..)
            params_provider: zero-arg callable returning current params
                (the trainer swaps in EMA weights for eval)
            cfg: MartConfig
        """
        self.model = model
        self.params_provider = params_provider
        self.cfg = cfg
        self.logger = logger
        self._jit_cache: Dict[Any, Any] = {}

    # ---------- jitted per-sentence greedy step ----------

    def _greedy_sentence_fn(self, first_step: bool):
        """Build (params, prev_ms, ids, feats, masks, ttypes) ->
        (cur_ms, ids, masks) jitted for this (first_step, shapes)."""
        cfg = self.cfg
        model = self.model

        def fn(params, prev_ms, input_ids, video_features, input_masks,
               token_type_ids):
            if first_step:
                prev_ms = [None] * cfg.num_hidden_layers

            def fwd(ms, ids, masks):
                return model.apply(
                    {"params": params}, ms, ids, video_features, masks,
                    token_type_ids, deterministic=True,
                    method=model.forward_step)

            def body(dec_idx, carry):
                ids, masks, next_symbols = carry
                ids = ids.at[:, dec_idx].set(next_symbols)
                masks = masks.at[:, dec_idx].set(1)
                _, _, scores = fwd(prev_ms, ids, masks)
                scores = scores.at[:, :, UNK].set(-1e10)
                row = jnp.take_along_axis(
                    scores, jnp.full((scores.shape[0], 1, 1), dec_idx),
                    axis=1)[:, 0]  # (N, V) at dec_idx
                next_words = jnp.argmax(row, axis=1).astype(ids.dtype)
                return ids, masks, next_words

            bsz = input_ids.shape[0]
            start = jnp.full((bsz,), BOS, input_ids.dtype)
            ids, masks, _ = jax.lax.fori_loop(
                cfg.max_v_len, cfg.max_v_len + cfg.max_t_len, body,
                (input_ids, input_masks, start))
            ids, masks = mask_tokens_after_eos(ids, masks)
            cur_ms, _, _ = fwd(prev_ms, ids, masks)
            return cur_ms, ids, masks

        return jax.jit(fn)

    def translate_batch_greedy(self, input_ids_list, video_features_list,
                               input_masks_list, token_type_ids_list
                               ) -> List[np.ndarray]:
        """Recurrent greedy (reference :201). Inputs stacked (S, N, ...).
        Returns [ (N, max_t_len) ] * S decoded text ids."""
        cfg = self.cfg
        params = self.params_provider()
        input_ids_list, input_masks_list = prepare_video_only_inputs(
            jnp.asarray(input_ids_list), jnp.asarray(input_masks_list),
            jnp.asarray(token_type_ids_list))

        step_size = len(input_ids_list)
        dec_seq_list = []
        prev_ms = None
        for idx in range(step_size):
            key = ("greedy", idx == 0, tuple(input_ids_list[idx].shape))
            if key not in self._jit_cache:
                self._jit_cache[key] = self._greedy_sentence_fn(idx == 0)
            fn = self._jit_cache[key]
            prev_ms, ids, _masks = fn(
                params, prev_ms, input_ids_list[idx],
                jnp.asarray(video_features_list[idx]),
                input_masks_list[idx],
                jnp.asarray(token_type_ids_list[idx]))
            dec_seq_list.append(np.asarray(
                jax.device_get(ids[:, cfg.max_v_len:])))
        return dec_seq_list

    # ---------- single-sentence (non-recurrent) greedy ----------

    def _greedy_single_fn(self):
        cfg = self.cfg
        model = self.model

        def fn(params, input_ids, video_features, input_masks,
               token_type_ids):
            def body(dec_idx, carry):
                ids, masks, next_symbols = carry
                ids = ids.at[:, dec_idx].set(next_symbols)
                masks = masks.at[:, dec_idx].set(1)
                _, scores = model.apply(
                    {"params": params}, ids, video_features, masks,
                    token_type_ids, None, deterministic=True)
                scores = scores.at[:, :, UNK].set(-1e10)
                row = jnp.take_along_axis(
                    scores, jnp.full((scores.shape[0], 1, 1), dec_idx),
                    axis=1)[:, 0]
                next_words = jnp.argmax(row, axis=1).astype(ids.dtype)
                return ids, masks, next_words

            bsz = input_ids.shape[0]
            start = jnp.full((bsz,), BOS, input_ids.dtype)
            ids, masks, _ = jax.lax.fori_loop(
                cfg.max_v_len, cfg.max_v_len + cfg.max_t_len, body,
                (input_ids, input_masks, start))
            return ids

        return jax.jit(fn)

    def translate_batch_single_sentence_greedy(
            self, input_ids, video_features, input_masks, token_type_ids
    ) -> np.ndarray:
        cfg = self.cfg
        params = self.params_provider()
        input_ids, input_masks = prepare_video_only_inputs(
            jnp.asarray(input_ids), jnp.asarray(input_masks),
            jnp.asarray(token_type_ids))
        key = ("greedy_single", tuple(input_ids.shape))
        if key not in self._jit_cache:
            self._jit_cache[key] = self._greedy_single_fn()
        ids = self._jit_cache[key](params, input_ids,
                                   jnp.asarray(video_features),
                                   input_masks,
                                   jnp.asarray(token_type_ids))
        return np.asarray(jax.device_get(ids))

    # ---------- dispatch ----------

    def translate_batch(self, model_inputs, use_beam: bool = False,
                        recurrent: bool = True, untied: bool = False,
                        xl: bool = False, mtrans: bool = False):
        """Dispatch (reference :388). Beam search lands with the
        beam_search module; greedy covers the shipped eval path
        (use_beam defaults false in all reference configs)."""
        if use_beam:
            raise NotImplementedError(
                "beam search arrives with mart/beam_search port")
        if recurrent:
            input_ids, video_feats, input_masks, ttypes = model_inputs
            return self.translate_batch_greedy(
                input_ids, video_feats, input_masks, ttypes)
        if untied or mtrans:
            raise NotImplementedError("untied greedy lands with the "
                                      "untied model variant")
        input_ids, video_feats, input_masks, ttypes = model_inputs
        return self.translate_batch_single_sentence_greedy(
            input_ids, video_feats, input_masks, ttypes)

    @classmethod
    def sort_res(cls, res_dict):
        """Sort output sentences by timestamp (reference :450)."""
        return {k: sorted(v, key=lambda x: float(x["timestamp"][0]))
                for k, v in res_dict.items()}
