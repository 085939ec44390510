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
                # (measured: drawing in bf16 instead of f32 does not change
                # step time on v5e — the cost is elsewhere — so keep f32)
                tn = jax.random.truncated_normal(
                    keys[i], -2.0, 2.0, out[k].shape, jnp.float32) * noise
                out[k] = out[k] + tn.astype(out[k].dtype)
    for k in ("vid_idx", "clip_idx", "par_idx", "sent_idx"):
        del out[k]
    return out


# ---------- fully device-resident pipeline: on-device sampling ----------

class RetrievalDeviceMeta:
    """
    Static per-datapoint metadata uploaded to device once, enabling the
    whole batch assembly (frame sampling + gather-index construction +
    masks) to run INSIDE the jitted step. Per batch the host then ships
    only (B,) datapoint ids — the end state of the host->device diet:
    features resident (RetrievalDeviceStore), metadata resident (here),
    per-step traffic a few hundred bytes.

    Sampling parity: validation center-sampling reproduces the reference
    formula floor(linspace(0,n,t,endpoint=False) + n/t/2) exactly
    (nntrainer/maths.py:12); train jitter uses standard per-interval
    uniform jitter floor((i+u_i)*n/t) — same marginal distribution as the
    reference's shuffled-interval scheme, different RNG stream (numpy ->
    jax PRNG). The host get_indices path remains for bit-parity needs.
    """

    def __init__(self, store: RetrievalDeviceStore,
                 fixed_shapes: Dict[str, int], max_frames: int,
                 sharding=None, batch_size: Optional[int] = None,
                 pack_parts: bool = True) -> None:
        ds = store.dataset
        n = len(ds.keys)
        n_parts = fixed_shapes["n_parts"]
        self.shapes = dict(fixed_shapes)
        self.max_frames = max_frames
        if pack_parts and batch_size is not None:
            # static pack budgets: no batch of `batch_size` distinct videos
            # can exceed the sum of the top-batch_size part counts, so the
            # packed layout can never overflow; +batch_size covers the
            # one-live-slot fixups on padded final-batch rows.
            def budget(counts):
                top = sorted(counts, reverse=True)[:batch_size]
                need = sum(top) + batch_size
                return min(-(-need // 64) * 64, batch_size * n_parts)

            self.shapes["pack_clips"] = budget(
                [len(ds.meta[k]["segments"]) for k in ds.keys])
            self.shapes["pack_sents"] = budget(
                [len(ds.text_feats.sentence_splits.get(
                    k, ds.text_feats.sentence_splits.get(
                        f"v_{k[:11]}", [1]))) for k in ds.keys])

        vid_off = np.zeros(n, np.int32)
        vid_nf = np.zeros(n, np.int32)
        seg_off = np.zeros((n, n_parts), np.int32)
        seg_nf = np.zeros((n, n_parts), np.int32)
        seg_valid = np.zeros((n, n_parts), bool)
        clip_num = np.zeros(n, np.int32)
        text_off = np.zeros(n, np.int32)
        sent_len = np.zeros((n, n_parts), np.int32)
        sent_off = np.zeros((n, n_parts), np.int32)
        sent_num = np.zeros(n, np.int32)
        par_len = np.zeros(n, np.int32)

        for i, (key, data_key) in enumerate(zip(ds.keys, ds.data_keys)):
            meta = ds.meta[key]
            vid_off[i] = store.vid_offset[data_key] + \
                meta["start_frame_vid"]
            vid_nf[i] = meta["num_frames_vid"]
            clip_num[i] = len(meta["segments"])
            for j, seg in enumerate(meta["segments"]):
                seg_off[i, j] = store.vid_offset[data_key] + \
                    seg["start_frame"]
                seg_nf[i, j] = seg["num_frames"]
                seg_valid[i, j] = True
            text_off[i] = store.text_offset[key]
            splits = ds.text_feats.sentence_splits.get(
                key, ds.text_feats.sentence_splits.get(f"v_{key[:11]}"))
            sent_num[i] = len(splits)
            ptr = 0
            for j, slen in enumerate(splits):
                sent_len[i, j] = slen
                sent_off[i, j] = text_off[i] + ptr
                ptr += slen
            par_len[i] = ptr

        put = lambda x: jax.device_put(x, sharding)  # noqa: E731
        self.tables = {
            "vid_off": put(vid_off), "vid_nf": put(vid_nf),
            "seg_off": put(seg_off), "seg_nf": put(seg_nf),
            "seg_valid": put(seg_valid), "clip_num": put(clip_num),
            "sent_len": put(sent_len), "sent_off": put(sent_off),
            "sent_num": put(sent_num), "par_len": put(par_len),
            "text_off": put(text_off),
        }


def _sample_frame_indices(rng: Optional[jax.Array], offset, n_frames,
                          target_slots: int, max_frames: int):
    """
    Device port of nntrainer/maths.py compute_indices for one sequence:
    returns (idx (target_slots,), mask, length) with padded slots -> first
    frame. t = min(n_frames, max_frames) frames are sampled: train =
    uniform jitter per interval, val = interval centers (exact reference
    formula).
    """
    t = jnp.minimum(n_frames, max_frames)
    i = jnp.arange(target_slots, dtype=jnp.float32)
    n_f = n_frames.astype(jnp.float32)
    t_f = jnp.maximum(t.astype(jnp.float32), 1.0)
    if rng is None:  # center sampling (val)
        pos = jnp.floor(i * n_f / t_f + n_f / t_f / 2.0)
    else:  # jittered (train)
        u = jax.random.uniform(rng, (target_slots,))
        pos = jnp.floor((i + u) * n_f / t_f)
    pos = jnp.clip(pos.astype(jnp.int32), 0,
                   jnp.maximum(n_frames - 1, 0))
    mask = jnp.arange(target_slots) < t
    idx = jnp.where(mask, offset + pos, offset)
    return idx, mask, t


def device_sample_batch(tables: Dict[str, jnp.ndarray],
                        dp_idx: jnp.ndarray,
                        shapes: Dict[str, int], max_frames: int, *,
                        rng: Optional[jax.Array] = None,
                        batch_valid: Optional[jnp.ndarray] = None
                        ) -> Dict[str, jnp.ndarray]:
    """
    DEVICE-side batch assembly: datapoint ids -> index batch (the same
    schema RetrievalDeviceStore.collate_indices builds on host). rng=None
    selects deterministic center sampling (validation).
    """
    b = dp_idx.shape[0]
    lv, lc = shapes["lv"], shapes["lc"]
    ls, lp = shapes["ls"], shapes["lp"]
    n_parts = shapes["n_parts"]
    if batch_valid is None:
        batch_valid = jnp.ones((b,), bool)

    vid_off = tables["vid_off"][dp_idx]
    vid_nf = tables["vid_nf"][dp_idx]
    seg_off = tables["seg_off"][dp_idx]
    seg_nf = tables["seg_nf"][dp_idx]
    seg_valid = tables["seg_valid"][dp_idx]
    clip_num = tables["clip_num"][dp_idx]
    sent_len = tables["sent_len"][dp_idx]
    sent_off = tables["sent_off"][dp_idx]
    sent_num = tables["sent_num"][dp_idx]
    par_len = tables["par_len"][dp_idx]
    text_off = tables["text_off"][dp_idx]

    if rng is None:
        vid_rngs = [None] * 1
        vid_idx, vid_mask, vid_len = jax.vmap(
            lambda o, nf: _sample_frame_indices(None, o, nf, lv,
                                                max_frames))(vid_off,
                                                             vid_nf)
        clip_idx, clip_mask, clip_len = jax.vmap(jax.vmap(
            lambda o, nf: _sample_frame_indices(None, o, nf, lc,
                                                max_frames)))(seg_off,
                                                              seg_nf)
    else:
        rng_v, rng_c = jax.random.split(rng)
        vkeys = jax.random.split(rng_v, b)
        vid_idx, vid_mask, vid_len = jax.vmap(
            lambda k, o, nf: _sample_frame_indices(k, o, nf, lv,
                                                   max_frames))(
            vkeys, vid_off, vid_nf)
        ckeys = jax.random.split(rng_c, b * n_parts)
        # keep trailing key-data dims (width differs per PRNG impl)
        ckeys = ckeys.reshape((b, n_parts) + ckeys.shape[1:])
        clip_idx, clip_mask, clip_len = jax.vmap(jax.vmap(
            lambda k, o, nf: _sample_frame_indices(k, o, nf, lc,
                                                   max_frames)))(
            ckeys, seg_off, seg_nf)

    # clamp masks by validity
    clip_valid = seg_valid & batch_valid[:, None]
    clip_mask = clip_mask & clip_valid[:, :, None]
    clip_len = jnp.where(clip_valid, clip_len, 0)
    # keep one live slot on padded rows (finite masked softmaxes)
    first_slot = (jnp.arange(n_parts)[None, :] == 0)
    pad_rows = ~batch_valid
    clip_valid = clip_valid | (pad_rows[:, None] & first_slot)
    clip_mask = clip_mask.at[:, :, 0].set(
        clip_mask[:, :, 0] | (pad_rows[:, None] & first_slot))
    clip_len = jnp.maximum(clip_len, (pad_rows[:, None]
                                      & first_slot).astype(jnp.int32))

    # text: deterministic ranges
    tok = jnp.arange(lp)[None, :]
    par_idx = text_off[:, None] + jnp.minimum(
        tok, jnp.maximum(par_len - 1, 0)[:, None])
    par_mask = tok < par_len[:, None]
    par_mask = par_mask.at[:, 0].set(True)
    stok = jnp.arange(ls)[None, None, :]
    sent_idx = sent_off[:, :, None] + jnp.minimum(
        stok, jnp.maximum(sent_len - 1, 0)[:, :, None])
    sent_valid = (sent_len > 0) & batch_valid[:, None]
    sent_mask = (stok < sent_len[:, :, None]) & sent_valid[:, :, None]
    sent_valid = sent_valid | (pad_rows[:, None] & first_slot)
    sent_mask = sent_mask.at[:, :, 0].set(
        sent_mask[:, :, 0] | (pad_rows[:, None] & first_slot))
    sent_lens = jnp.where(sent_valid, jnp.maximum(sent_len, 1), 0)

    vid_mask = vid_mask.at[:, 0].set(True)
    batch = {
        "batch_valid": batch_valid,
        "vid_idx": vid_idx.astype(jnp.int32),
        "vid_mask": vid_mask,
        "vid_len": jnp.maximum(vid_len, 1).astype(jnp.int32),
        "clip_idx": clip_idx.astype(jnp.int32),
        "clip_mask": clip_mask,
        "clip_len": clip_len.astype(jnp.int32),
        "clip_valid": clip_valid,
        "clip_num": jnp.maximum(clip_num, 1).astype(jnp.int32),
        "par_idx": par_idx.astype(jnp.int32),
        "par_mask": par_mask,
        "par_len": jnp.maximum(par_len, 1).astype(jnp.int32),
        "sent_idx": sent_idx.astype(jnp.int32),
        "sent_mask": sent_mask,
        "sent_len": sent_lens.astype(jnp.int32),
        "sent_valid": sent_valid,
        "sent_num": jnp.maximum(sent_num, 1).astype(jnp.int32),
    }

    # ---- optional part packing: drop padded clip/sentence slots ----
    # The dense (B, N, L) layout wastes local-net compute on padded part
    # slots (mean ~7.7 clips vs N=16 on the yc2 workloads -> ~2x). With a
    # static budget P >= any batch's total part count (the loader uses the
    # sum of the dataset's top-B counts, so no batch can overflow), the
    # valid slots are packed to the front of a (P, L) layout; the model
    # scatters the local embeddings back to (B, N, D) — a tiny tensor —
    # before the global net. Semantics are unchanged: every real part is
    # encoded exactly once, padded slots simply never exist.
    pack_clips = shapes.get("pack_clips")
    pack_sents = shapes.get("pack_sents")

    def pack(valid2d, arrs, budget):
        bn = valid2d.size
        order = jnp.argsort(
            jnp.where(valid2d.reshape(-1), 0, 1), stable=True)
        slots = order[:budget]
        owner = (slots // n_parts).astype(jnp.int32)
        pos = (slots % n_parts).astype(jnp.int32)
        slot_valid = valid2d.reshape(-1)[slots]
        packed = [a.reshape((bn,) + a.shape[2:])[slots] for a in arrs]
        return owner, pos, slot_valid, packed

    if pack_clips is not None and pack_clips < b * n_parts:
        owner, pos, sv, (ci, cm, cl) = pack(
            clip_valid, [batch["clip_idx"], batch["clip_mask"],
                         batch["clip_len"]], pack_clips)
        batch.update(clip_idx=ci, clip_mask=cm, clip_len=cl,
                     clip_owner=owner, clip_pos=pos, clip_slot_valid=sv)
    if pack_sents is not None and pack_sents < b * n_parts:
        owner, pos, sv, (si, sm, sl) = pack(
            sent_valid, [batch["sent_idx"], batch["sent_mask"],
                         batch["sent_len"]], pack_sents)
        batch.update(sent_idx=si, sent_mask=sm, sent_len=sl,
                     sent_owner=owner, sent_pos=pos, sent_slot_valid=sv)
    return batch
