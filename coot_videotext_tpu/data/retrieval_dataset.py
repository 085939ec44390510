"""
Retrieval dataset: metadata -> frame sampling -> dense static-shape batches.

Behavioral parity with reference coot/dataset_retrieval.py:105-511:
    - metadata build: seconds->frames via floor(fps*t_start) /
      ceil(fps*t_stop)+add_stop_frame (clamped to num_frames), swapped
      timestamps fixed, segments expanded to `expand_segments` minimum
      (reference :171-194).
    - __getitem__: video sampled to <= max_frames frames and each clip
      sampled to <= max_frames via compute_indices (train = jittered
      random, val = center; reference :261-303), optional truncnorm
      frame/word noise, paragraph features split into per-sentence tensors
      by the sentence_splits token counts (reference :317-328).

XPU redesign of the collation (reference collate_fn :335-463): instead of
flattening a dynamic number of clips/sentences across the batch, batches are
DENSE [B, N_parts, L, D] with validity masks, padded to BUCKETED static
shapes (smallest ladder value >= the batch max) so XLA compiles a handful of
shapes instead of one per batch. Fully-padded slots are masked out of every
pool and loss downstream. Mask convention: True = valid (the reference uses
0 = real / 1 = pad, dataset_retrieval.py:3-5; inverted here once, globally).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import numpy as np

from coot_videotext_tpu.data.features_loader import (
    TextFeaturesLoader, VideoFeatureLoader)
from coot_videotext_tpu.tasks.retrieval.config import RetrievalDatasetConfig
from coot_videotext_tpu.utils import maths

TRAIN_SPLIT = "train"
DEFAULT_SUBSET = "default"

# padding ladders: smallest entry >= n is used as the static padded size.
# Aligned to multiples of 8 (f32 sublane) to keep XLA tiles happy.
LENGTH_LADDER = [8, 16, 24, 32, 48, 64, 80, 96, 128, 160, 192, 256,
                 320, 384, 448, 512, 640, 768, 896, 1024, 1280, 1536, 2048]
COUNT_LADDER = [1, 2, 4, 6, 8, 12, 16, 20, 24, 32, 40, 48, 64, 80, 96, 128]


def bucket_size(n: int, ladder: List[int]) -> int:
    """Smallest ladder value >= n (falls back to n rounded up to 8)."""
    for v in ladder:
        if v >= n:
            return v
    return ((n + 7) // 8) * 8


def truncnorm_noise(shape, std: float, rng: np.random.RandomState
                    ) -> np.ndarray:
    """Truncated normal noise, resampling |x| > 2 std (reference
    utils_torch.py:73-109 get_truncnorm_tensor)."""
    out = rng.randn(*shape) * std
    bad = np.abs(out) > 2 * std
    while bad.any():
        out[bad] = rng.randn(int(bad.sum())) * std
        bad = np.abs(out) > 2 * std
    return out.astype(np.float32)


class RetrievalDataset:
    """Map-style dataset over one split (reference RetrievalDataset :105)."""

    def __init__(self, cfg: RetrievalDatasetConfig,
                 path_data: Union[str, Path], *,
                 verbose: bool = False,
                 rng: Optional[np.random.RandomState] = None) -> None:
        self.path_data = Path(path_data)
        self.cfg = cfg
        self.split = cfg.split
        self.verbose = verbose
        self.is_train = self.split == TRAIN_SPLIT
        self.rng = rng if rng is not None else np.random.RandomState()
        self.path_dataset = self.path_data / cfg.name

        raw_meta_file = self.path_dataset / f"meta_{cfg.metadata_name}.json"
        raw_meta = json.loads(raw_meta_file.read_text(encoding="utf8"))

        if cfg.subset != DEFAULT_SUBSET:
            raise NotImplementedError(f"Subset {cfg.subset} not supported")
        self.keys = [k for k, v in raw_meta.items()
                     if v["split"] == self.split]
        if not self.keys:
            splits = sorted({v["split"] for v in raw_meta.values()})
            raise ValueError(
                f"No datapoints in split {self.split}; available: {splits}")
        if cfg.max_datapoints > -1:
            self.keys = self.keys[:cfg.max_datapoints]
        self.data_keys = [raw_meta[k]["data_key"] for k in self.keys]

        self.vid_feats = VideoFeatureLoader(
            self.path_dataset, cfg.vid_feat_name, cfg.vid_feat_source,
            self.data_keys, preload_vid_feat=cfg.preload_vid_feat)

        # build split metadata: segment frame ranges (reference :158-194)
        self.meta: Dict[str, Dict[str, Any]] = {}
        num_segments = 0
        expansions = 0
        for key, data_key in zip(self.keys, self.data_keys):
            meta = dict(raw_meta[key])
            num_frames = self.vid_feats.num_frames[data_key]
            meta["start_frame_vid"] = 0
            meta["stop_frame_vid"] = num_frames
            meta["num_frames_vid"] = num_frames
            fps = num_frames / meta["duration_sec"]
            segments = []
            for seg in meta["segments"]:
                seg = dict(seg)
                t0, t1 = seg["start_sec"], seg["stop_sec"]
                if t1 < t0:
                    t0, t1 = t1, t0
                start_frame = int(np.floor(fps * t0))
                stop_frame = int(np.ceil(fps * t1)) + cfg.add_stop_frame
                stop_frame = min(stop_frame, num_frames)
                start_frame, stop_frame, changed = maths.expand_video_segment(
                    num_frames, cfg.expand_segments, start_frame, stop_frame)
                if changed:
                    expansions += 1
                seg["start_frame"] = start_frame
                seg["num_frames"] = stop_frame - start_frame
                segments.append(seg)
                num_segments += 1
            meta["segments"] = segments
            self.meta[key] = meta
        if verbose:
            print(f"Built metadata for {self.split}: {len(self.keys)} "
                  f"datapoints, {num_segments} segments "
                  f"({expansions} expanded).")

        self.text_feats = TextFeaturesLoader(
            self.path_dataset, cfg.text_feat_name, cfg.text_feat_source,
            self.keys, preload_text_feat=cfg.preload_text_feat)

    def __len__(self) -> int:
        return len(self.keys)

    def _sample_frames(self, key: str, start: int, total: int,
                       target: int) -> np.ndarray:
        indices = maths.compute_indices(total, target, self.is_train,
                                        rng=self.rng)
        indices = indices + start
        data_key = self.meta[key]["data_key"]
        return self.vid_feats[data_key][indices]

    def get_indices(self, item: int) -> Dict[str, Any]:
        """
        Index-only datapoint for the HBM-resident store path: sampled frame
        indices (video-relative) instead of feature arrays. Same sampling
        RNG stream semantics as __getitem__.
        """
        key = self.keys[item]
        vid = self.meta[key]
        cfg = self.cfg
        vid_len = min(vid["num_frames_vid"], cfg.max_frames)
        vid_idx = maths.compute_indices(vid["num_frames_vid"], vid_len,
                                        self.is_train, rng=self.rng)
        vid_idx = vid_idx + vid["start_frame_vid"]
        clip_idx = []
        for seg in vid["segments"]:
            c_len = min(seg["num_frames"], cfg.max_frames)
            cidx = maths.compute_indices(seg["num_frames"], c_len,
                                         self.is_train, rng=self.rng)
            clip_idx.append(cidx + seg["start_frame"])
        sentences = [seg["text"] if seg["text"] is not None else "undefined"
                     for seg in vid["segments"]]
        sent_split = self.text_feats.sentence_splits.get(
            key, self.text_feats.sentence_splits.get(f"v_{key[:11]}"))
        return {
            "key": key,
            "data_key": vid["data_key"],
            "sentences": sentences,
            "vid_idx": vid_idx,
            "clip_idx": clip_idx,
            "clip_num": len(clip_idx),
            "par_len": int(sum(sent_split)),
            "sent_split": list(sent_split),
        }

    def __getitem__(self, item: int) -> Dict[str, Any]:
        key = self.keys[item]
        vid = self.meta[key]
        cfg = self.cfg

        clip_num = len(vid["segments"])

        vid_len = min(vid["num_frames_vid"], cfg.max_frames)
        vid_feat = self._sample_frames(
            key, vid["start_frame_vid"], vid["num_frames_vid"], vid_len)
        if cfg.frames_noise != 0:
            vid_feat = vid_feat + truncnorm_noise(
                vid_feat.shape, cfg.frames_noise, self.rng)

        clip_feats: List[np.ndarray] = []
        for seg in vid["segments"]:
            c_len = min(seg["num_frames"], cfg.max_frames)
            c = self._sample_frames(key, seg["start_frame"],
                                    seg["num_frames"], c_len)
            if cfg.frames_noise != 0:
                c = c + truncnorm_noise(c.shape, cfg.frames_noise, self.rng)
            clip_feats.append(c)

        sentences = [seg["text"] if seg["text"] is not None else "undefined"
                     for seg in vid["segments"]]

        par_feat, sent_split = self.text_feats[key]
        if cfg.words_noise != 0:
            par_feat = par_feat + truncnorm_noise(
                par_feat.shape, cfg.words_noise, self.rng)
        sent_feats: List[np.ndarray] = []
        ptr = 0
        for n_tok in sent_split:
            sent_feats.append(par_feat[ptr:ptr + n_tok])
            ptr += n_tok

        return {
            "key": key,
            "data_key": vid["data_key"],
            "sentences": sentences,
            "vid_feat": vid_feat.astype(np.float32),
            "clip_feats": clip_feats,
            "par_feat": par_feat.astype(np.float32),
            "sent_feats": sent_feats,
            "clip_num": clip_num,
            "sent_num": len(sent_feats),
        }

    # ---------- collation ----------

    def compute_slab_budgets(self, batch_size: int) -> Dict[str, int]:
        """
        Static row budgets for the packed-transfer slabs (collate_slab):
        no batch of `batch_size` distinct videos can need more rows than
        the sum of the top-`batch_size` per-video row counts, so padding
        every slab to these budgets gives ONE compiled shape per step
        function. Rounded up to 4096 rows (keeps gather tiles aligned and
        the bucket count tiny if budgets are ever recomputed).
        """
        mf = self.cfg.max_frames
        vid_rows = []
        for k in self.keys:
            m = self.meta[k]
            r = min(m["num_frames_vid"], mf)
            r += sum(min(seg["num_frames"], mf) for seg in m["segments"])
            vid_rows.append(r)
        text_rows = []
        for k in self.keys:
            split = self.text_feats.sentence_splits.get(
                k, self.text_feats.sentence_splits.get(f"v_{k[:11]}"))
            if split is None:
                # never guess a row count: an undersized budget trips
                # the collate-time overflow assert mid-epoch (or would
                # silently truncate under -O)
                raise KeyError(
                    f"no sentence_splits entry for datapoint {k!r} "
                    f"(or 'v_{k[:11]}'); cannot size slab_text_rows")
            text_rows.append(sum(split))

        def budget(rows: List[int]) -> int:
            top = sorted(rows, reverse=True)[:batch_size]
            # +batch_size covers the one-live-row fixups on padded rows
            need = sum(top) + batch_size
            return -(-need // 4096) * 4096

        return {"slab_vid_rows": budget(vid_rows),
                "slab_text_rows": budget(text_rows)}

    def collate_slab(self, points: List[Dict[str, Any]], *,
                     batch_size: Optional[int] = None,
                     fixed_shapes: Optional[Dict[str, int]] = None,
                     slab_budgets: Optional[Dict[str, int]] = None
                     ) -> Dict[str, Any]:
        """
        Packed-transfer collation: the bit-exact twin of collate_fn that
        ships ~4x fewer bytes. Instead of the dense zero-padded
        [B, N, L, D] feature tensors (~80% padding on the yc2 workloads),
        the batch carries two PACKED row slabs — `vid_store` (video+clip
        frames) and `text_store` (paragraph tokens; sentences index into
        the same rows) — plus the same int32 gather-index schema that
        RetrievalDeviceStore.collate_indices builds. The jitted step
        reconstructs the exact dense batch on device with
        gather_dense_batch, so the model sees identical tensors: the
        gathered values are the very arrays collate_fn would have placed
        (host-side sampling, noise, and RNG stream all unchanged).
        """
        n_real = len(points)
        b = batch_size if batch_size is not None else n_real
        assert b >= n_real

        dv = points[0]["vid_feat"].shape[-1]
        dt = points[0]["par_feat"].shape[-1]

        if fixed_shapes is not None:
            lv, lc = fixed_shapes["lv"], fixed_shapes["lc"]
            ls, lp = fixed_shapes["ls"], fixed_shapes["lp"]
            n_parts = fixed_shapes["n_parts"]
        else:
            lv = bucket_size(max(p["vid_feat"].shape[0] for p in points),
                             LENGTH_LADDER)
            lp = bucket_size(max(p["par_feat"].shape[0] for p in points),
                             LENGTH_LADDER)
            n_parts = bucket_size(
                max(max(p["clip_num"], p["sent_num"]) for p in points),
                COUNT_LADDER)
            lc = bucket_size(
                max(c.shape[0] for p in points for c in p["clip_feats"]),
                LENGTH_LADDER)
            ls = bucket_size(
                max(s.shape[0] for p in points for s in p["sent_feats"]),
                LENGTH_LADDER)

        # row 0 of each slab is reserved as an all-zero row: every padded
        # index defaults to 0, so the gather reconstructs the dense batch
        # bit-exactly (zeros at every padded position, like collate_fn)
        need_vid = 1 + sum(p["vid_feat"].shape[0]
                           + sum(c.shape[0] for c in p["clip_feats"])
                           for p in points)
        need_text = 1 + sum(p["par_feat"].shape[0] for p in points)
        if slab_budgets is not None:
            rv = slab_budgets["slab_vid_rows"]
            rt = slab_budgets["slab_text_rows"]
            assert need_vid <= rv and need_text <= rt, (
                f"slab budgets ({rv}, {rt}) overflowed "
                f"({need_vid}, {need_text})")
        else:
            rv = -(-need_vid // 4096) * 4096
            rt = -(-need_text // 4096) * 4096

        batch = {
            "key": [p["key"] for p in points],
            "data_key": [p["data_key"] for p in points],
            "sentences": [p["sentences"] for p in points],
            "batch_valid": np.zeros(b, bool),
            "vid_store": np.zeros((rv, dv), np.float32),
            "text_store": np.zeros((rt, dt), np.float32),
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
        vid_store = batch["vid_store"]
        text_store = batch["text_store"]
        vp = tp = 1  # row 0 = reserved zero row
        for i, p in enumerate(points):
            batch["batch_valid"][i] = True
            nv = p["vid_feat"].shape[0]
            vid_store[vp:vp + nv] = p["vid_feat"]
            batch["vid_idx"][i, :nv] = vp + np.arange(nv)
            batch["vid_mask"][i, :nv] = True
            batch["vid_len"][i] = nv
            vp += nv
            batch["clip_num"][i] = p["clip_num"]
            for j, c in enumerate(p["clip_feats"]):
                nc = c.shape[0]
                vid_store[vp:vp + nc] = c
                batch["clip_idx"][i, j, :nc] = vp + np.arange(nc)
                batch["clip_mask"][i, j, :nc] = True
                batch["clip_len"][i, j] = nc
                batch["clip_valid"][i, j] = True
                vp += nc
            np_tok = p["par_feat"].shape[0]
            text_store[tp:tp + np_tok] = p["par_feat"]
            batch["par_idx"][i, :np_tok] = tp + np.arange(np_tok)
            batch["par_mask"][i, :np_tok] = True
            batch["par_len"][i] = np_tok
            batch["sent_num"][i] = p["sent_num"]
            ptr = 0
            # sentences are slices of the paragraph rows: index, not copy
            for j, s in enumerate(p["sent_feats"]):
                ns = s.shape[0]
                batch["sent_idx"][i, j, :ns] = tp + ptr + np.arange(ns)
                batch["sent_mask"][i, j, :ns] = True
                batch["sent_len"][i, j] = ns
                batch["sent_valid"][i, j] = True
                ptr += ns
            tp += np_tok
        # padded batch rows: one valid slot so masked math stays finite
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

    def compute_fixed_shapes(self) -> Dict[str, int]:
        """
        Dataset-level static padded dims (lv, lc, ls, lp, n_parts): padding
        every batch to these produces EXACTLY ONE compiled XLA program per
        step function — the right trade on real TPU chips where each
        recompile costs tens of seconds. Per-batch bucketing (the default)
        compiles a handful of smaller shapes instead.
        """
        cfg = self.cfg
        lv = bucket_size(
            min(cfg.max_frames,
                max(self.meta[k]["num_frames_vid"] for k in self.keys)),
            LENGTH_LADDER)
        lc = bucket_size(
            min(cfg.max_frames,
                max(seg["num_frames"] for k in self.keys
                    for seg in self.meta[k]["segments"])),
            LENGTH_LADDER)
        n_parts = bucket_size(
            max(len(self.meta[k]["segments"]) for k in self.keys),
            COUNT_LADDER)
        lp = bucket_size(
            max(sum(self.text_feats.sentence_splits.get(
                k, self.text_feats.sentence_splits.get(f"v_{k[:11]}", [1])))
                for k in self.keys), LENGTH_LADDER)
        ls = bucket_size(
            max(max(self.text_feats.sentence_splits.get(
                k, self.text_feats.sentence_splits.get(f"v_{k[:11]}", [1])))
                for k in self.keys), LENGTH_LADDER)
        return {"lv": lv, "lc": lc, "ls": ls, "lp": lp,
                "n_parts": n_parts}

    def collate_fn(self, points: List[Dict[str, Any]], *,
                   batch_size: Optional[int] = None,
                   fixed_shapes: Optional[Dict[str, int]] = None
                   ) -> Dict[str, Any]:
        """
        Collate datapoints into one dense, bucket-padded numpy batch.

        If `batch_size` > len(points) the batch is padded with zero videos
        carrying batch_valid=False (static batch shape for XLA; the losses
        and eval mask them out). `fixed_shapes` (from compute_fixed_shapes)
        overrides per-batch bucketing with dataset-level static dims.
        """
        n_real = len(points)
        b = batch_size if batch_size is not None else n_real
        assert b >= n_real

        dv = points[0]["vid_feat"].shape[-1]
        dt = points[0]["par_feat"].shape[-1]

        if fixed_shapes is not None:
            lv, lc = fixed_shapes["lv"], fixed_shapes["lc"]
            ls, lp = fixed_shapes["ls"], fixed_shapes["lp"]
            n_parts = fixed_shapes["n_parts"]
        else:
            lv = bucket_size(max(p["vid_feat"].shape[0] for p in points),
                             LENGTH_LADDER)
            lp = bucket_size(max(p["par_feat"].shape[0] for p in points),
                             LENGTH_LADDER)
            n_parts = bucket_size(
                max(max(p["clip_num"], p["sent_num"]) for p in points),
                COUNT_LADDER)
            lc = bucket_size(
                max(c.shape[0] for p in points for c in p["clip_feats"]),
                LENGTH_LADDER)
            ls = bucket_size(
                max(s.shape[0] for p in points for s in p["sent_feats"]),
                LENGTH_LADDER)

        batch = {
            "key": [p["key"] for p in points],
            "data_key": [p["data_key"] for p in points],
            "sentences": [p["sentences"] for p in points],
            "batch_valid": np.zeros(b, bool),
            "vid_feat": np.zeros((b, lv, dv), np.float32),
            "vid_mask": np.zeros((b, lv), bool),
            "vid_len": np.zeros(b, np.int32),
            "clip_feat": np.zeros((b, n_parts, lc, dv), np.float32),
            "clip_mask": np.zeros((b, n_parts, lc), bool),
            "clip_len": np.zeros((b, n_parts), np.int32),
            "clip_valid": np.zeros((b, n_parts), bool),
            "clip_num": np.zeros(b, np.int32),
            "par_feat": np.zeros((b, lp, dt), np.float32),
            "par_mask": np.zeros((b, lp), bool),
            "par_len": np.zeros(b, np.int32),
            "sent_feat": np.zeros((b, n_parts, ls, dt), np.float32),
            "sent_mask": np.zeros((b, n_parts, ls), bool),
            "sent_len": np.zeros((b, n_parts), np.int32),
            "sent_valid": np.zeros((b, n_parts), bool),
            "sent_num": np.zeros(b, np.int32),
        }
        for i, p in enumerate(points):
            batch["batch_valid"][i] = True
            nv = p["vid_feat"].shape[0]
            batch["vid_feat"][i, :nv] = p["vid_feat"]
            batch["vid_mask"][i, :nv] = True
            batch["vid_len"][i] = nv
            np_tok = p["par_feat"].shape[0]
            batch["par_feat"][i, :np_tok] = p["par_feat"]
            batch["par_mask"][i, :np_tok] = True
            batch["par_len"][i] = np_tok
            batch["clip_num"][i] = p["clip_num"]
            batch["sent_num"][i] = p["sent_num"]
            for j, c in enumerate(p["clip_feats"]):
                batch["clip_feat"][i, j, :c.shape[0]] = c
                batch["clip_mask"][i, j, :c.shape[0]] = True
                batch["clip_len"][i, j] = c.shape[0]
                batch["clip_valid"][i, j] = True
            for j, s in enumerate(p["sent_feats"]):
                batch["sent_feat"][i, j, :s.shape[0]] = s
                batch["sent_mask"][i, j, :s.shape[0]] = True
                batch["sent_len"][i, j] = s.shape[0]
                batch["sent_valid"][i, j] = True
        # padded batch rows: length >= 1 everywhere so masked softmaxes and
        # divisions stay finite (their outputs are masked out downstream)
        for i in range(n_real, b):
            batch["vid_mask"][i, 0] = True
            batch["vid_len"][i] = 1
            batch["par_mask"][i, 0] = True
            batch["par_len"][i] = 1
            batch["clip_mask"][i, 0, 0] = True
            batch["clip_len"][i, 0] = 1
            batch["clip_valid"][i, 0] = True
            batch["clip_num"][i] = 1
            batch["sent_mask"][i, 0, 0] = True
            batch["sent_len"][i, 0] = 1
            batch["sent_valid"][i, 0] = True
            batch["sent_num"][i] = 1
        return batch


class RetrievalBatchLoader:
    """
    Minimal DataLoader replacement (reference uses torch DataLoader,
    nntrainer/data.py:21): shuffled batching, static batch size with
    final-batch padding, len() in batches.
    """

    def __init__(self, dataset: RetrievalDataset, batch_size: int, *,
                 shuffle: bool, drop_last: bool = False,
                 seed: int = 0, fixed_shapes: bool = False,
                 device_store=None, pack_transfer: bool = False) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.fixed_shapes = (dataset.compute_fixed_shapes()
                             if fixed_shapes else None)
        # HBM-resident store: yield index-only batches (device_store.py)
        self.device_store = device_store
        # device-resident metadata: yield datapoint-id-only batches and
        # let the jitted step do sampling + index construction on device
        self.device_meta = None
        # packed transfers: ship row slabs + gather indices instead of the
        # dense zero-padded feature tensors (~4x fewer bytes over the
        # host->device link; bit-exact — see collate_slab). Slab rows are
        # bucketed PER BATCH (4096-row granularity): the handful of
        # resulting shapes each compile once (persistent cache), and the
        # mean batch ships ~40% fewer bytes than the overflow-safe static
        # budget — which matters doubly on this environment, where every
        # transferred byte is also leaked host RAM (axon client bug).
        self.pack_transfer = pack_transfer and device_store is None
        self.slab_budgets = None

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
        for start in range(0, n, self.batch_size):
            idx = order[start:start + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                return
            if self.device_meta is not None:
                dp_idx = np.zeros(self.batch_size, np.int32)
                dp_idx[:len(idx)] = idx
                batch_valid = np.zeros(self.batch_size, bool)
                batch_valid[:len(idx)] = True
                yield {
                    "key": [self.dataset.keys[int(i)] for i in idx],
                    "data_key": [self.dataset.data_keys[int(i)]
                                 for i in idx],
                    "sentences": [
                        [seg["text"] or "undefined" for seg in
                         self.dataset.meta[self.dataset.keys[int(i)]][
                             "segments"]] for i in idx],
                    "dp_idx": dp_idx,
                    "batch_valid": batch_valid,
                }
            elif self.device_store is not None:
                points = [self.dataset.get_indices(int(i)) for i in idx]
                yield self.device_store.collate_indices(
                    points, batch_size=self.batch_size,
                    fixed_shapes=self.fixed_shapes)
            elif self.pack_transfer:
                points = [self.dataset[int(i)] for i in idx]
                yield self.dataset.collate_slab(
                    points, batch_size=self.batch_size,
                    fixed_shapes=self.fixed_shapes,
                    slab_budgets=self.slab_budgets)
            else:
                points = [self.dataset[int(i)] for i in idx]
                yield self.dataset.collate_fn(
                    points, batch_size=self.batch_size,
                    fixed_shapes=self.fixed_shapes)


def estimate_store_bytes(dataset: "RetrievalDataset",
                         bytes_per_elem: int = 2) -> int:
    """Estimated size of the full feature set in device memory."""
    vid = sum(dataset.vid_feats.num_frames.get(k, 0)
              for k in set(dataset.data_keys)) * \
        dataset.cfg.vid_feat_dim
    text = sum(sum(s) for s in
               dataset.text_feats.sentence_splits.values()) * \
        dataset.cfg.text_feat_dim
    return (vid + text) * bytes_per_elem


def device_store_budget(device=None, fraction: float = 0.55,
                        fallback: float = 6e9) -> float:
    """HBM budget for the auto feature-store decision: a fraction of the
    accelerator's free memory (the rest is headroom for params, opt
    state, activations, batch buffers, and allocator fragmentation).
    Falls back to a flat 6 GB where the backend reports no stats (CPU)."""
    try:
        import jax
        dev = device if device is not None else jax.local_devices()[0]
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit", 0)
        in_use = stats.get("bytes_in_use", 0)
        if limit > 0:
            return fraction * (limit - in_use)
    except Exception:
        pass
    return fallback


def create_retrieval_datasets_and_loaders(
        cfg, path_data: Union[str, Path], *, seed: int = 0,
        verbose: bool = False, fixed_shapes: Optional[bool] = None,
        device_preload: Optional[bool] = None):
    """Factory (reference dataset_retrieval.py:466). `fixed_shapes`
    defaults to the config knob `pad_fixed_shapes`. `device_preload`
    (default: config `preload_device`, "auto" = when it fits) uploads the
    full feature set to device HBM and switches the loaders to index-only
    batches (data/device_store.py)."""
    if fixed_shapes is None:
        fixed_shapes = getattr(cfg.dataset_train, "pad_fixed_shapes", False)
    train_rng = np.random.RandomState(seed)
    val_rng = np.random.RandomState(seed + 1)
    train_set = RetrievalDataset(cfg.dataset_train, path_data,
                                 verbose=verbose, rng=train_rng)
    val_set = RetrievalDataset(cfg.dataset_val, path_data,
                               verbose=verbose, rng=val_rng)

    if device_preload is None:
        knob = getattr(cfg.dataset_train, "preload_device", "auto")
        if knob == "auto":
            # size the estimate with the ACTUAL store itemsize (the store
            # is kept in the compute dtype: bf16 halves it, f32 doubles
            # the old bf16-only guess) against the device's real free HBM
            dtype = str(getattr(cfg, "compute_dtype", "float32"))
            itemsize = 2 if dtype == "bfloat16" else 4
            total = (estimate_store_bytes(train_set, itemsize)
                     + estimate_store_bytes(val_set, itemsize))
            device_preload = total < device_store_budget()
        else:
            device_preload = bool(knob)
    train_store = val_store = None
    if device_preload:
        from coot_videotext_tpu.data.device_store import (
            RetrievalDeviceStore)
        dtype = getattr(cfg, "compute_dtype", "float32")
        train_store = RetrievalDeviceStore(train_set, dtype=dtype)
        val_store = RetrievalDeviceStore(val_set, dtype=dtype)

    def _pack(dset_cfg) -> bool:
        """pack_transfer knob: "auto" = packed slabs whenever the features
        are NOT device-resident and a real accelerator is attached (on the
        CPU backend there is no transfer to shrink)."""
        knob = getattr(dset_cfg, "pack_transfer", "auto")
        if knob != "auto":
            return bool(knob)
        if device_preload:
            return False
        try:
            import jax
            return jax.local_devices()[0].platform != "cpu"
        except Exception:
            return False

    train_loader = RetrievalBatchLoader(
        train_set, cfg.train.batch_size, shuffle=cfg.dataset_train.shuffle,
        drop_last=cfg.dataset_train.drop_last, seed=seed,
        fixed_shapes=fixed_shapes, device_store=train_store,
        pack_transfer=_pack(cfg.dataset_train))
    val_loader = RetrievalBatchLoader(
        val_set, cfg.val.batch_size, shuffle=False, drop_last=False,
        seed=seed, fixed_shapes=fixed_shapes, device_store=val_store,
        pack_transfer=_pack(cfg.dataset_val))

    # full device-resident pipeline: with the store AND dataset-level
    # static shapes, upload the per-datapoint metadata too and let the
    # jitted step sample on device (host ships datapoint ids only)
    sample_on_device = getattr(cfg.dataset_train, "sample_on_device",
                               True)
    if device_preload and fixed_shapes and sample_on_device:
        from coot_videotext_tpu.data.device_store import (
            RetrievalDeviceMeta)
        pack = getattr(cfg.dataset_train, "pack_parts", True)
        train_loader.device_meta = RetrievalDeviceMeta(
            train_store, train_loader.fixed_shapes,
            cfg.dataset_train.max_frames,
            batch_size=cfg.train.batch_size, pack_parts=pack)
        val_loader.device_meta = RetrievalDeviceMeta(
            val_store, val_loader.fixed_shapes,
            cfg.dataset_val.max_frames,
            batch_size=cfg.val.batch_size,
            pack_parts=getattr(cfg.dataset_val, "pack_parts", pack))
    return train_set, val_set, train_loader, val_loader
