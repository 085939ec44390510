"""
HBM-resident feature store: the TPU-native successor of the reference's
RAM preload (coot/features_loader.py:49-52 shared-memory arrays).

The retrieval datasets are small (YouCook2 2d3d: ~4.4 GB of video features
in bf16, text ~0.5 GB), so the ENTIRE feature set is uploaded to device
HBM once at startup; every training batch then ships only int32 gather
indices (a few KB) instead of ~1.7 GB of duplicated dense float frames —
the decisive fix for the host->device link being the bottleneck. The
dense (B, L, D) / (B, N, Lc, D) batch the model consumes is materialized
ON DEVICE by a fused gather at the start of the jitted step.

Layout: all videos concatenated along frames into one (total_frames, D)
array + per-video offsets; paragraphs likewise. Index -1 (=> row 0) is
used for padded slots; their mask is False so the gathered garbage never
contributes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np


class RetrievalDeviceStore:
    """Uploads a RetrievalDataset's full feature set to device HBM."""

    def __init__(self, dataset, *, dtype: str = "bfloat16",
                 sharding=None) -> None:
        self.dataset = dataset
        np_dtype = (ml_dtypes.bfloat16 if dtype == "bfloat16"
                    else np.float32)

        vid_chunks = []
        self.vid_offset: Dict[str, int] = {}
        offset = 0
        seen = set()
        for key, data_key in zip(dataset.keys, dataset.data_keys):
            if data_key in seen:
                continue
            seen.add(data_key)
            feat = dataset.vid_feats[data_key].astype(np_dtype)
            self.vid_offset[data_key] = offset
            offset += feat.shape[0]
            vid_chunks.append(feat)
        vid_all = np.concatenate(vid_chunks, axis=0)

        text_chunks = []
        self.text_offset: Dict[str, int] = {}
        offset = 0
        for key in dataset.keys:
            feat, _splits = dataset.text_feats[key]
            self.text_offset[key] = offset
            offset += feat.shape[0]
            text_chunks.append(feat.astype(np_dtype))
        text_all = np.concatenate(text_chunks, axis=0)

        self.vid_store = jax.device_put(vid_all, sharding)
        self.text_store = jax.device_put(text_all, sharding)
        self.nbytes = vid_all.nbytes + text_all.nbytes

    # ---------- host side: index-only collation ----------

    def collate_indices(self, points, *, batch_size: Optional[int] = None,
                        fixed_shapes: Optional[Dict[str, int]] = None
                        ) -> Dict[str, Any]:
        """
        Build the usual dense batch dict, but with `vid_feat`, `clip_feat`,
        `par_feat`, `sent_feat` replaced by int32 index arrays
        `vid_idx (B, Lv)`, `clip_idx (B, N, Lc)`, `par_idx (B, Lp)`,
        `sent_idx (B, N, Ls)` into the device store. Points must carry the
        raw sampled frame indices (dataset __getitem__ with
        return_indices=True).
        """
        ds = self.dataset
        n_real = len(points)
        b = batch_size if batch_size is not None else n_real
        from coot_videotext_tpu.data.retrieval_dataset import (
            LENGTH_LADDER, bucket_size)
        if fixed_shapes is not None:
            lv, lc = fixed_shapes["lv"], fixed_shapes["lc"]
            ls, lp = fixed_shapes["ls"], fixed_shapes["lp"]
            n_parts = fixed_shapes["n_parts"]
        else:
            from coot_videotext_tpu.data.retrieval_dataset import (
                COUNT_LADDER)
            lv = bucket_size(max(len(p["vid_idx"]) for p in points),
                             LENGTH_LADDER)
            lp = bucket_size(max(p["par_len"] for p in points),
                             LENGTH_LADDER)
            n_parts = bucket_size(
                max(p["clip_num"] for p in points), COUNT_LADDER)
            lc = bucket_size(
                max(len(c) for p in points for c in p["clip_idx"]),
                LENGTH_LADDER)
            ls = bucket_size(
                max(s for p in points for s in p["sent_split"]),
                LENGTH_LADDER)

        batch = {
            "key": [p["key"] for p in points],
            "data_key": [p["data_key"] for p in points],
            "sentences": [p["sentences"] for p in points],
            "batch_valid": np.zeros(b, bool),
            "vid_idx": np.zeros((b, lv), np.int32),
            "vid_mask": np.zeros((b, lv), bool),
            "vid_len": np.ones(b, np.int32),
            "clip_idx": np.zeros((b, n_parts, lc), np.int32),
            "clip_mask": np.zeros((b, n_parts, lc), bool),
            "clip_len": np.zeros((b, n_parts), np.int32),
            "clip_valid": np.zeros((b, n_parts), bool),
            "clip_num": np.ones(b, np.int32),
            "par_idx": np.zeros((b, lp), np.int32),
            "par_mask": np.zeros((b, lp), bool),
            "par_len": np.ones(b, np.int32),
            "sent_idx": np.zeros((b, n_parts, ls), np.int32),
            "sent_mask": np.zeros((b, n_parts, ls), bool),
            "sent_len": np.zeros((b, n_parts), np.int32),
            "sent_valid": np.zeros((b, n_parts), bool),
            "sent_num": np.ones(b, np.int32),
        }
        for i, p in enumerate(points):
            batch["batch_valid"][i] = True
            voff = self.vid_offset[p["data_key"]]
            toff = self.text_offset[p["key"]]
            nv = len(p["vid_idx"])
            batch["vid_idx"][i, :nv] = voff + np.asarray(p["vid_idx"])
            batch["vid_mask"][i, :nv] = True
            batch["vid_len"][i] = nv
            np_tok = p["par_len"]
            batch["par_idx"][i, :np_tok] = toff + np.arange(np_tok)
            batch["par_mask"][i, :np_tok] = True
            batch["par_len"][i] = np_tok
            batch["clip_num"][i] = p["clip_num"]
            batch["sent_num"][i] = len(p["sent_split"])
            for j, cidx in enumerate(p["clip_idx"]):
                nc = len(cidx)
                batch["clip_idx"][i, j, :nc] = voff + np.asarray(cidx)
                batch["clip_mask"][i, j, :nc] = True
                batch["clip_len"][i, j] = nc
                batch["clip_valid"][i, j] = True
            ptr = 0
            for j, slen in enumerate(p["sent_split"]):
                batch["sent_idx"][i, j, :slen] = toff + ptr + np.arange(
                    slen)
                batch["sent_mask"][i, j, :slen] = True
                batch["sent_len"][i, j] = slen
                batch["sent_valid"][i, j] = True
                ptr += slen
        # padded rows: one valid slot to keep masked math finite
        for i in range(n_real, b):
            batch["vid_mask"][i, 0] = True
            batch["par_mask"][i, 0] = True
            batch["clip_mask"][i, 0, 0] = True
            batch["clip_len"][i, 0] = 1
            batch["clip_valid"][i, 0] = True
            batch["sent_mask"][i, 0, 0] = True
            batch["sent_len"][i, 0] = 1
            batch["sent_valid"][i, 0] = True
        return batch


def gather_dense_batch(batch: Dict[str, jnp.ndarray],
                       vid_store: jnp.ndarray,
                       text_store: jnp.ndarray, *,
                       frames_noise: float = 0.0,
                       words_noise: float = 0.0,
                       rng: Optional[jax.Array] = None
                       ) -> Dict[str, jnp.ndarray]:
    """
    DEVICE-side: materialize the dense feature batch from index arrays.
    Optional truncnorm feature noise is drawn here (the reference draws it
    per datapoint copy on host, dataset_retrieval.py:286-303; drawing per
    gathered slot keeps video and clip copies independently noised, same
    distribution).
    """
    out = dict(batch)
    out["vid_feat"] = vid_store[batch["vid_idx"]]
    out["clip_feat"] = vid_store[batch["clip_idx"]]
    out["par_feat"] = text_store[batch["par_idx"]]
    out["sent_feat"] = text_store[batch["sent_idx"]]
    if rng is not None and (frames_noise or words_noise):
        keys = jax.random.split(rng, 4)
        for i, (k, noise) in enumerate((("vid_feat", frames_noise),
                                        ("clip_feat", frames_noise),
                                        ("par_feat", words_noise),
                                        ("sent_feat", words_noise))):
            if noise:
                tn = jax.random.truncated_normal(
                    keys[i], -2.0, 2.0, out[k].shape, jnp.float32) * noise
                out[k] = out[k] + tn.astype(out[k].dtype)
    for k in ("vid_idx", "clip_idx", "par_idx", "sent_idx"):
        del out[k]
    return out
