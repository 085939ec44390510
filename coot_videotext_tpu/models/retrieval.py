"""
COOT retrieval model: 4 cooperative transformer networks
(video local/global, text local/global).

Functional parity with reference coot/model_retrieval.py:57-197, redesigned
for XLA static shapes:
    - The reference flattens a variable number of clips/sentences across the
      batch into (sum_clips, L, D) and scatter-loops them back into a padded
      (B, max_clips, D) tensor per step (model_retrieval.py:124-136). Here the
      data pipeline delivers a DENSE (B, max_clips, L, D) layout with validity
      masks; the local network runs over the reshaped (B*max_clips, L, D)
      batch and the "repack" is a free reshape. Fully-padded clip slots are
      masked out of every loss and pool.
    - Input dims chain as in the reference (:68-73): video_local <-
      vid_feat_dim; video_global <- video_local.output_dim; etc.

Mask convention: True = valid.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from coot_videotext_tpu.models.transformer import CootTransformer
from coot_videotext_tpu.typext import ConstantHolder

Dtype = Any


class RetrievalNetworksConst(ConstantHolder):
    """The 4 network names (reference configs_retrieval.py:182)."""
    NET_VIDEO_LOCAL = "net_video_local"
    NET_VIDEO_GLOBAL = "net_video_global"
    NET_TEXT_LOCAL = "net_text_local"
    NET_TEXT_GLOBAL = "net_text_global"


def _encode_hierarchy(net_local: CootTransformer,
                      net_global: CootTransformer,
                      use_context: bool,
                      seq_feat: jnp.ndarray, seq_mask: jnp.ndarray,
                      seq_len: jnp.ndarray,
                      part_feat: jnp.ndarray, part_mask: jnp.ndarray,
                      part_len: jnp.ndarray, part_valid: jnp.ndarray,
                      part_num: jnp.ndarray, *,
                      part_owner: jnp.ndarray = None,
                      part_pos: jnp.ndarray = None,
                      part_slot_valid: jnp.ndarray = None,
                      deterministic: bool) -> Dict[str, jnp.ndarray]:
    """
    Shared video/text hierarchy encoding (reference encode_visual :86 /
    encode_text :143 are symmetric).

    Args:
        seq_*: whole-sequence input (video frames / paragraph tokens),
            shapes (B, L, D) / (B, L) / (B,)
        part_*: per-part input (clips / sentences), either the dense
            layout (B, N, Lp, D) / (B, N, Lp) / (B, N), or — when
            part_owner/part_pos/part_slot_valid are given — the PACKED
            layout (P, Lp, D) from device_sample_batch, where the local
            net only sees real parts and the embeddings are scattered
            back to (B, N, D) for the global net (each packed slot maps
            to a distinct (owner, pos), so the scatter is collision-free;
            unpacked padded slots keep zeros, which downstream masks
            treat exactly like the dense layout's junk embeddings).
        part_valid: (B, N) True where the part slot holds a real clip/sentence
        part_num: (B,) number of real parts

    Returns dict with keys: emb (global, B x Dg), part_emb (B x N x Dl),
        context (B x Dl), part_valid, part_num.
    """
    # context from the local net over the full sequence
    context, _ = net_local(seq_feat, seq_mask, seq_len, None,
                           deterministic=deterministic)

    b, n = part_valid.shape
    if part_feat.ndim == 3:  # packed (P, Lp, D)
        part_emb_flat, _ = net_local(part_feat, part_mask, part_len, None,
                                     deterministic=deterministic)
        d_out = part_emb_flat.shape[-1]
        # where-based masking (not multiply): the backward of `where`
        # SELECTS the cotangent, so a NaN/inf gradient arising on a padded
        # slot downstream is replaced by 0 instead of 0 * NaN = NaN — this
        # mirrors the reference's scatter, which routes padded-row
        # gradients into a constant zeros tensor and discards them
        # (model_retrieval.py:124-136).
        contrib = jnp.where(part_slot_valid[:, None], part_emb_flat, 0.0)
        part_emb = jnp.zeros((b, n, d_out), part_emb_flat.dtype).at[
            part_owner, part_pos].set(contrib)
    else:
        # all parts through the same local net as one big batch
        _, _, lp, d = part_feat.shape
        flat_feat = part_feat.reshape(b * n, lp, d)
        flat_mask = part_mask.reshape(b * n, lp)
        flat_len = part_len.reshape(b * n)
        part_emb_flat, _ = net_local(flat_feat, flat_mask, flat_len, None,
                                     deterministic=deterministic)
        part_emb = part_emb_flat.reshape(b, n, -1)
        # zero padded part slots: the reference scatters local embeddings
        # into a ZERO-initialized (B, max_clips, D) tensor
        # (model_retrieval.py:124-136), and the global net's unmasked
        # avg_special pool makes those slots observable — junk there
        # would leak into the global embedding. `where`, not multiply: its
        # backward SELECTS the cotangent, so NaN gradients arising on
        # padded slots downstream are dropped (the reference's scatter
        # likewise routes them into a constant and discards them) instead
        # of poisoning the shared local-net parameters via 0 * NaN.
        part_emb = jnp.where(part_valid[..., None], part_emb, 0.0)

    hidden = context if use_context else None
    emb, _ = net_global(part_emb, part_valid, part_num, hidden,
                        deterministic=deterministic)
    return {
        "emb": emb,
        "part_emb": part_emb,
        "context": context,
        "part_valid": part_valid,
        "part_num": part_num,
    }


class RetrievalModel(nn.Module):
    """
    The 4-network COOT model. `model_cfgs` maps RetrievalNetworksConst names
    to TransformerConfig; `input_dims` are informational (flax infers shapes).
    """
    model_cfgs: Any  # Dict[str, TransformerConfig], static
    max_len: int = 1024
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        # local nets consume raw pipeline features (non-differentiable) —
        # this unlocks the fused input-projection kernel; the global nets
        # consume differentiable local-net outputs and must not set it
        self.net_video_local = CootTransformer(
            cfg=self.model_cfgs[RetrievalNetworksConst.NET_VIDEO_LOCAL],
            max_len=self.max_len, dtype=self.dtype, input_is_data=True)
        self.net_video_global = CootTransformer(
            cfg=self.model_cfgs[RetrievalNetworksConst.NET_VIDEO_GLOBAL],
            max_len=self.max_len, dtype=self.dtype)
        self.net_text_local = CootTransformer(
            cfg=self.model_cfgs[RetrievalNetworksConst.NET_TEXT_LOCAL],
            max_len=self.max_len, dtype=self.dtype, input_is_data=True)
        self.net_text_global = CootTransformer(
            cfg=self.model_cfgs[RetrievalNetworksConst.NET_TEXT_GLOBAL],
            max_len=self.max_len, dtype=self.dtype)

    def encode_visual(self, batch: Dict[str, jnp.ndarray], *,
                      deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Video branch (reference model_retrieval.py:86)."""
        cfg_global = self.model_cfgs[RetrievalNetworksConst.NET_VIDEO_GLOBAL]
        out = _encode_hierarchy(
            self.net_video_local, self.net_video_global,
            cfg_global.use_context,
            batch["vid_feat"], batch["vid_mask"], batch["vid_len"],
            batch["clip_feat"], batch["clip_mask"], batch["clip_len"],
            batch["clip_valid"], batch["clip_num"],
            part_owner=batch.get("clip_owner"),
            part_pos=batch.get("clip_pos"),
            part_slot_valid=batch.get("clip_slot_valid"),
            deterministic=deterministic)
        return {
            "vid_emb": out["emb"],
            "clip_emb": out["part_emb"],
            "vid_context": out["context"],
            "clip_valid": out["part_valid"],
            "clip_num": out["part_num"],
        }

    def encode_text(self, batch: Dict[str, jnp.ndarray], *,
                    deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Text branch (reference model_retrieval.py:143)."""
        cfg_global = self.model_cfgs[RetrievalNetworksConst.NET_TEXT_GLOBAL]
        out = _encode_hierarchy(
            self.net_text_local, self.net_text_global,
            cfg_global.use_context,
            batch["par_feat"], batch["par_mask"], batch["par_len"],
            batch["sent_feat"], batch["sent_mask"], batch["sent_len"],
            batch["sent_valid"], batch["sent_num"],
            part_owner=batch.get("sent_owner"),
            part_pos=batch.get("sent_pos"),
            part_slot_valid=batch.get("sent_slot_valid"),
            deterministic=deterministic)
        return {
            "par_emb": out["emb"],
            "sent_emb": out["part_emb"],
            "par_context": out["context"],
            "sent_valid": out["part_valid"],
            "sent_num": out["part_num"],
        }

    def __call__(self, batch: Dict[str, jnp.ndarray], *,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Full forward: both branches; used for init and the train step."""
        visual = self.encode_visual(batch, deterministic=deterministic)
        text = self.encode_text(batch, deterministic=deterministic)
        return {**visual, **text}
