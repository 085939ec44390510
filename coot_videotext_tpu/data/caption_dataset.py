"""
MART captioning dataset: annotation jsons -> joint video+text sequences ->
stacked recurrent-step batches.

Behavioral parity with reference mart/recursive_caption_dataset.py:46-766:
    - special tokens PAD..UNK ids 0..6, IGNORE=-1 (:47-61)
    - video input either MART rgb+flow .npy pairs (resnet+bn concat,
      frame<->second table from captioning_video_feat_duration.csv) or COOT
      embedding h5 (vid/ctx/clip lookup via clip_num cumsum, :296-345)
    - joint sequence [CLS] [VID]*v [SEP] [PAD]* + [BOS] w... [EOS] [PAD]*
      with mask 1=valid and shifted input_labels (IGNORE on video/pad
      positions) (:392-426, :529-605)
    - _get_vt_features packs COOT vectors by coot_mode vid/clip/vidclip/
      vidclipctx (:493)
    - nltk word_tokenize, lowercased, truncated to max_t_len-2 (:607)
    - recurrent collate pads every video to the padded step count with
      IGNORE-labelled dummy steps (:646-695)

XLA redesign of the collation: instead of a python list of per-step dicts,
steps are STACKED into (S, N, L[, D]) arrays with S either bucketed per
batch or fixed at the dataset max (fixed_shapes mode -> exactly one
compiled program), so the whole recurrent forward jits as one SPMD program.
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import h5py
import numpy as np

from coot_videotext_tpu.data.retrieval_dataset import (
    COUNT_LADDER, bucket_size)

# special tokens (reference :47-61)
PAD_TOKEN = "[PAD]"
CLS_TOKEN = "[CLS]"
SEP_TOKEN = "[SEP]"
VID_TOKEN = "[VID]"
BOS_TOKEN = "[BOS]"
EOS_TOKEN = "[EOS]"
UNK_TOKEN = "[UNK]"
PAD, CLS, SEP, VID, BOS, EOS, UNK = range(7)
IGNORE = -1


def word_tokenize(sentence: str) -> List[str]:
    """nltk word_tokenize with a punkt-free fallback (the Treebank
    tokenizer nltk uses internally; identical output on single
    sentences)."""
    import nltk
    try:
        return nltk.tokenize.word_tokenize(sentence)
    except LookupError:
        from nltk.tokenize import TreebankWordTokenizer
        return TreebankWordTokenizer().tokenize(sentence)


class DataTypesConstCaption:
    COOT_EMB = "coot_emb"
    VIDEO_FEAT = "video_feat"


class RecursiveCaptionDataset:
    """Captioning dataset (reference RecursiveCaptionDataset :46)."""

    PAD_TOKEN, CLS_TOKEN, SEP_TOKEN, VID_TOKEN = (
        PAD_TOKEN, CLS_TOKEN, SEP_TOKEN, VID_TOKEN)
    BOS_TOKEN, EOS_TOKEN, UNK_TOKEN = BOS_TOKEN, EOS_TOKEN, UNK_TOKEN
    PAD, CLS, SEP, VID, BOS, EOS, UNK = PAD, CLS, SEP, VID, BOS, EOS, UNK
    IGNORE = IGNORE

    def __init__(self, dset_name: str, max_t_len: int, max_v_len: int,
                 max_n_sen: int, mode: str = "train", *,
                 recurrent: bool = True, untied: bool = False,
                 video_feature_dir: Optional[str] = None,
                 coot_model_name: Optional[str] = None,
                 coot_mode: str = "vidclip", coot_dim_vid: int = 768,
                 coot_dim_clip: int = 384,
                 annotations_dir: str = "annotations",
                 coot_feat_dir: str = "provided_embeddings",
                 dataset_max: Optional[int] = None,
                 preload: bool = False) -> None:
        self.dset_name = dset_name
        self.annotations_dir = Path(annotations_dir)
        self.coot_model_name = coot_model_name
        self.coot_mode = coot_mode
        self.coot_dim_vid = coot_dim_vid
        self.coot_dim_clip = coot_dim_clip
        self.coot_feat_dir = Path(coot_feat_dir)
        self.video_feature_dir = (Path(video_feature_dir) / dset_name
                                  if video_feature_dir else None)
        self.duration_file = (self.annotations_dir / dset_name /
                              "captioning_video_feat_duration.csv")
        self.word2idx_file = (self.annotations_dir / dset_name /
                              "mart_word2idx.json")
        self.word2idx: Dict[str, int] = json.loads(
            self.word2idx_file.read_text(encoding="utf8"))
        self.idx2word = {int(v): k for k, v in self.word2idx.items()}

        self.max_seq_len = max_v_len + max_t_len
        self.max_v_len = max_v_len
        self.max_t_len = max_t_len
        self.max_n_sen = max_n_sen
        self.mode = mode
        self.preload = preload
        self.recurrent = recurrent
        self.untied = untied
        assert not (recurrent and untied)

        # metadata file per dataset/mode (reference :110-127)
        ann = self.annotations_dir / dset_name
        if dset_name == "activitynet":
            data_path = {"train": ann / "train.json",
                         "val": ann / "captioning_val_1.json",
                         "test": ann / "captioning_test_1.json"}[mode]
        elif dset_name == "youcook2":
            data_path = {"train": ann / "captioning_train.json",
                         "val": ann / "captioning_val.json"}[mode]
        else:
            raise ValueError(f"Unknown dataset {dset_name}")

        raw_data = json.loads(data_path.read_text(encoding="utf8"))
        coll_data = []
        for i, (k, line) in enumerate(raw_data.items()):
            if dataset_max is not None and 0 < dataset_max <= i:
                break
            line = dict(line)
            line["name"] = k
            line["timestamps"] = line["timestamps"][:max_n_sen]
            line["sentences"] = line["sentences"][:max_n_sen]
            coll_data.append(line)

        if recurrent:
            self.data = coll_data
        else:  # flatten into single sentences (reference :140-154)
            single = []
            for d in coll_data:
                num_sen = min(max_n_sen, len(d["sentences"]))
                single.extend([{
                    "duration": d["duration"], "name": d["name"],
                    "timestamp": d["timestamps"][idx],
                    "sentence": d["sentences"][idx], "idx": idx,
                } for idx in range(num_sen)])
            self.data = single

        # video input source
        if coot_model_name is not None:
            self.data_type = DataTypesConstCaption.COOT_EMB
            coot_dataset_mode = "val" if mode == "test" else mode
            self.coot_emb_h5_file = (
                self.coot_feat_dir /
                f"{coot_model_name}_{coot_dataset_mode}.h5")
            assert self.coot_emb_h5_file.is_file(), (
                f"Coot embeddings file not found: {self.coot_emb_h5_file}")
            with h5py.File(self.coot_emb_h5_file, "r") as h5:
                vid_ids = [key.decode("utf8") if isinstance(key, bytes)
                           else str(key) for key in h5["key"]]
                clip_nums = np.asarray(h5["clip_num"])
            clip_ids = []
            for vid_id, clip_num in zip(vid_ids, clip_nums):
                for c in range(int(clip_num)):
                    clip_ids.append((vid_id, c))
            self.coot_clip_nums = np.asarray(clip_nums)
            self.coot_vid_id_to_vid_number = {
                v: i for i, v in enumerate(vid_ids)}
            self.coot_vid_clip_id_to_clip_number = {
                f"{vid_id}/{clip_id}": i
                for i, (vid_id, clip_id) in enumerate(clip_ids)}
            self.frame_to_second = None
        else:
            self.data_type = DataTypesConstCaption.VIDEO_FEAT
            # frame->second table (reference :209-226)
            frame_to_second = {}
            sampling_sec = 0.5
            for line in self.duration_file.read_text().splitlines():
                vid_name, vid_dur, vid_frame = [
                    e.strip() for e in line.split(",")]
                if dset_name == "activitynet":
                    frame_to_second[vid_name] = (
                        float(vid_dur)
                        * int(float(vid_frame) / int(float(vid_dur))
                              * sampling_sec) / float(vid_frame))
                else:  # youcook2
                    frame_to_second[vid_name] = (
                        float(vid_dur)
                        * math.ceil(float(vid_frame) / float(vid_dur)
                                    * sampling_sec) / float(vid_frame))
            if dset_name == "activitynet":
                frame_to_second["_0CqozZun3U"] = sampling_sec
            # drop videos with missing feature files (reference :227-248)
            self.missing_video_names = []
            for e in self.data:
                video_name = (e["name"][2:] if dset_name == "activitynet"
                              else e["name"])
                for suffix in ("bn", "resnet"):
                    p = self.video_feature_dir / f"{video_name}_{suffix}.npy"
                    if not p.exists():
                        self.missing_video_names.append(video_name)
            if dset_name == "activitynet":
                self.data = [e for e in self.data
                             if e["name"][2:] not in
                             self.missing_video_names]
            else:
                self.data = [e for e in self.data
                             if e["name"] not in self.missing_video_names]
            assert self.data, "No data found; check video feature dir."
            self.frame_to_second = frame_to_second

        self.preloaded_videos: Dict[str, Any] = {}
        if preload:
            for meta in self.data:
                name = meta["name"]
                if name not in self.preloaded_videos:
                    if self.data_type == DataTypesConstCaption.VIDEO_FEAT:
                        self.preloaded_videos[name] = \
                            self._load_mart_video_feature(name)
                    else:
                        self.preloaded_videos[name] = \
                            self._load_coot_video_feature(name)

    def __len__(self) -> int:
        return len(self.data)

    # ---------- feature loading ----------

    def _load_mart_video_feature(self, raw_name: str) -> np.ndarray:
        """rgb+flow npy concat (reference :278)."""
        if raw_name in self.preloaded_videos:
            return self.preloaded_videos[raw_name]
        video_name = (raw_name[2:] if self.dset_name == "activitynet"
                      else raw_name)
        resnet = np.load(self.video_feature_dir / f"{video_name}_resnet.npy")
        bn = np.load(self.video_feature_dir / f"{video_name}_bn.npy")
        return np.concatenate([resnet, bn], axis=1)

    def _load_coot_video_feature(self, raw_name: str
                                 ) -> Tuple[np.ndarray, np.ndarray,
                                            np.ndarray]:
        """COOT embedding lookup (reference :296)."""
        if raw_name in self.preloaded_videos:
            return self.preloaded_videos[raw_name]
        try:
            vid_num = self.coot_vid_id_to_vid_number[raw_name]
            fixed_name = raw_name
        except KeyError:
            mode = "val_1" if self.mode == "val" else self.mode
            fixed_name = f"{raw_name[2:]}_{mode}"
            vid_num = self.coot_vid_id_to_vid_number[fixed_name]
        with h5py.File(self.coot_emb_h5_file, "r") as h5:
            vid_feat = np.asarray(h5["vid_emb"][vid_num])
            vidctx_feat = np.asarray(h5["vid_context"][vid_num])
            num_clips = int(self.coot_clip_nums[vid_num])
            clip_feats = np.stack([
                np.asarray(h5["clip_emb"][
                    self.coot_vid_clip_id_to_clip_number[
                        f"{fixed_name}/{c}"]])
                for c in range(num_clips)], axis=0)
        return vid_feat, vidctx_feat, clip_feats

    # ---------- sequence building ----------

    @classmethod
    def _convert_to_feat_index_st_ed(cls, feat_len, timestamp, frm2sec):
        """Wall time -> feature index range (reference :480)."""
        st = int(math.floor(timestamp[0] / frm2sec))
        ed = int(math.ceil(timestamp[1] / frm2sec))
        ed = min(ed, feat_len - 1)
        st = min(st, ed - 1)
        assert st <= ed <= feat_len
        return st, ed

    def _get_vt_features(self, video_feat_tuple, clip_idx: int,
                         max_v_l: int) -> Tuple[np.ndarray, int]:
        """Pack COOT vectors by coot_mode (reference :493)."""
        vid_feat, vid_ctx_feat, clip_feats = video_feat_tuple
        clip_feat = clip_feats[clip_idx]
        dv, dc = self.coot_dim_vid, self.coot_dim_clip
        if self.coot_mode == "clip":
            feat = np.zeros((max_v_l, dc))
            feat[0] = clip_feat
        elif self.coot_mode == "vidclip":
            feat = np.zeros((max_v_l, dv + dc))
            feat[0, :dv] = vid_feat
            feat[0, dv:dv + dc] = clip_feat
        elif self.coot_mode == "vidclipctx":
            feat = np.zeros((max_v_l, dv + dc * 2))
            feat[0, :dv] = vid_feat
            feat[0, dv:dv + dc] = vid_ctx_feat
            feat[0, dv + dc:dv + dc * 2] = clip_feat
        elif self.coot_mode == "vid":
            feat = np.zeros((max_v_l, dv))
            feat[0] = vid_feat
        else:
            raise NotImplementedError(
                f"Unknown: opt.vtmode = {self.coot_mode}")
        valid_l = 1
        # NOTE the reference asserts valid_l == max_v_l
        # (recursive_caption_dataset.py:539), which only holds for the
        # joint layout (max_v_l = max_v_len - 2 = 1); its untied/mtrans +
        # COOT path (max_v_l = max_v_len = 3) would crash on that assert —
        # a latent reference bug. Here extra rows stay zero and the untied
        # caller masks them out.
        assert valid_l <= max_v_l, f"valid {valid_l} max {max_v_l}"
        return feat, valid_l

    def _load_indexed_video_feature(self, raw_feat, timestamp, frm2sec,
                                    clip_idx: int):
        """Joint-sequence video part (reference :529)."""
        max_v_l = self.max_v_len - 2
        if self.data_type == DataTypesConstCaption.COOT_EMB:
            raw_feat, valid_l = self._get_vt_features(raw_feat, clip_idx,
                                                      max_v_l)
            video_tokens = ([CLS_TOKEN] + [VID_TOKEN] * valid_l
                            + [SEP_TOKEN]
                            + [PAD_TOKEN] * (max_v_l - valid_l))
            mask = [1] * (valid_l + 2) + [0] * (max_v_l - valid_l)
            feat = np.zeros((self.max_seq_len, raw_feat.shape[1]))
            feat[1:len(raw_feat) + 1] = raw_feat
            return feat, video_tokens, mask

        feat_len = len(raw_feat)
        st, ed = self._convert_to_feat_index_st_ed(feat_len, timestamp,
                                                   frm2sec)
        indexed_feat_len = ed - st + 1
        feat = np.zeros((self.max_seq_len, raw_feat.shape[1]))
        if indexed_feat_len > max_v_l:
            idx = np.linspace(st, ed, max_v_l, endpoint=True).astype(
                np.int64).tolist()
            assert max(idx) < feat_len
            feat[1:max_v_l + 1] = raw_feat[idx]
            video_tokens = ([CLS_TOKEN] + [VID_TOKEN] * max_v_l
                            + [SEP_TOKEN])
            mask = [1] * (max_v_l + 2)
        else:
            valid_l = ed - st + 1
            feat[1:valid_l + 1] = raw_feat[st:ed + 1]
            video_tokens = ([CLS_TOKEN] + [VID_TOKEN] * valid_l
                            + [SEP_TOKEN]
                            + [PAD_TOKEN] * (max_v_l - valid_l))
            mask = [1] * (valid_l + 2) + [0] * (max_v_l - valid_l)
        return feat, video_tokens, mask

    def _load_indexed_video_feature_untied(self, raw_feat, timestamp,
                                           frm2sec, clip_idx: int):
        """Untied video part, no CLS/SEP (reference :572)."""
        max_v_l = self.max_v_len
        if self.data_type == DataTypesConstCaption.COOT_EMB:
            feat, valid_l = self._get_vt_features(raw_feat, clip_idx,
                                                  max_v_l)
            return feat, [1] * valid_l + [0] * (max_v_l - valid_l)
        feat_len = len(raw_feat)
        st, ed = self._convert_to_feat_index_st_ed(feat_len, timestamp,
                                                   frm2sec)
        indexed_feat_len = ed - st + 1
        if indexed_feat_len > max_v_l:
            idx = np.linspace(st, ed, max_v_l, endpoint=True).astype(
                np.int64).tolist()
            assert max(idx) < feat_len
            return raw_feat[idx], [1] * max_v_l
        feat = np.zeros((max_v_l, raw_feat.shape[1]))
        valid_l = ed - st + 1
        feat[:valid_l] = raw_feat[st:ed + 1]
        return feat, [1] * valid_l + [0] * (max_v_l - valid_l)

    def _tokenize_pad_sentence(self, sentence: str):
        """[BOS] w.. [EOS] [PAD]* (reference :607)."""
        max_t_len = self.max_t_len
        tokens = word_tokenize(sentence.lower())[:max_t_len - 2]
        tokens = [BOS_TOKEN] + tokens + [EOS_TOKEN]
        valid_l = len(tokens)
        mask = [1] * valid_l + [0] * (max_t_len - valid_l)
        tokens += [PAD_TOKEN] * (max_t_len - valid_l)
        return tokens, mask

    def clip_sentence_to_feature(self, name, timestamp, sentence,
                                 video_feature, clip_idx: int):
        """One joint clip-sentence example (reference :392)."""
        frm2sec = None
        if self.data_type == DataTypesConstCaption.VIDEO_FEAT:
            frm2sec = self.frame_to_second[
                name[2:] if self.dset_name == "activitynet" else name]
        feat, video_tokens, video_mask = self._load_indexed_video_feature(
            video_feature, timestamp, frm2sec, clip_idx)
        text_tokens, text_mask = self._tokenize_pad_sentence(sentence)
        input_tokens = video_tokens + text_tokens
        input_ids = [self.word2idx.get(t, self.word2idx[UNK_TOKEN])
                     for t in input_tokens]
        # labels shifted right; IGNORE on video+pad (reference :412-415)
        input_labels = (
            [IGNORE] * len(video_tokens)
            + [IGNORE if m == 0 else tid for tid, m in
               zip(input_ids[-len(text_mask):], text_mask)][1:]
            + [IGNORE])
        input_mask = video_mask + text_mask
        token_type_ids = [0] * self.max_v_len + [1] * self.max_t_len
        data = dict(
            name=name, input_tokens=input_tokens,
            input_ids=np.asarray(input_ids, np.int64),
            input_labels=np.asarray(input_labels, np.int64),
            input_mask=np.asarray(input_mask, np.float32),
            token_type_ids=np.asarray(token_type_ids, np.int64),
            video_feature=feat.astype(np.float32))
        meta = dict(name=name, timestamp=timestamp, sentence=sentence)
        return data, meta

    def clip_sentence_to_feature_untied(self, name, timestamp, sentence,
                                        raw_video_feature, clip_idx: int):
        """One untied example (reference :428)."""
        frm2sec = None
        if self.data_type == DataTypesConstCaption.VIDEO_FEAT:
            frm2sec = self.frame_to_second[
                name[2:] if self.dset_name == "activitynet" else name]
        video_feature, video_mask = \
            self._load_indexed_video_feature_untied(
                raw_video_feature, timestamp, frm2sec, clip_idx)
        text_tokens, text_mask = self._tokenize_pad_sentence(sentence)
        text_ids = [self.word2idx.get(t, self.word2idx[UNK_TOKEN])
                    for t in text_tokens]
        text_labels = [IGNORE if m == 0 else tid for tid, m in
                       zip(text_ids, text_mask)][1:] + [IGNORE]
        data = dict(
            name=name, text_tokens=text_tokens,
            text_ids=np.asarray(text_ids, np.int64),
            text_mask=np.asarray(text_mask, np.float32),
            text_labels=np.asarray(text_labels, np.int64),
            video_feature=video_feature.astype(np.float32),
            video_mask=np.asarray(video_mask, np.float32))
        meta = dict(name=name, timestamp=timestamp, sentence=sentence)
        return data, meta

    def convert_example_to_features(self, example):
        """(reference :347)."""
        raw_name = example["name"]
        if self.data_type == DataTypesConstCaption.VIDEO_FEAT:
            video_feature = self._load_mart_video_feature(raw_name)
        else:
            video_feature = self._load_coot_video_feature(raw_name)
        if self.recurrent:
            num_sen = len(example["sentences"])
            feats, metas = [], []
            for clip_idx in range(num_sen):
                d, m = self.clip_sentence_to_feature(
                    example["name"], example["timestamps"][clip_idx],
                    example["sentences"][clip_idx], video_feature,
                    clip_idx)
                feats.append(d)
                metas.append(m)
            return feats, metas
        if self.untied:
            return self.clip_sentence_to_feature_untied(
                example["name"], example["timestamp"],
                example["sentence"], video_feature, example["idx"])
        return self.clip_sentence_to_feature(
            example["name"], example["timestamp"], example["sentence"],
            video_feature, example["idx"])

    def __getitem__(self, index: int):
        return self.convert_example_to_features(self.data[index])

    def convert_ids_to_sentence(self, ids, rm_padding: bool = True,
                                return_sentence_only: bool = True) -> str:
        """Cut at first EOS (reference :623)."""
        rm_padding = True if return_sentence_only else rm_padding
        if rm_padding:
            raw_words = [self.idx2word[int(wid)] for wid in ids
                         if int(wid) not in (PAD, IGNORE)]
        else:
            raw_words = [self.idx2word[int(wid)] for wid in ids
                         if int(wid) != IGNORE]
        if return_sentence_only:
            words = []
            for w in raw_words[1:]:  # no [BOS]
                if w == EOS_TOKEN:
                    break
                words.append(w)
        else:
            words = raw_words
        return " ".join(words)

    # ---------- collation ----------

    def collate_fn(self, batch, *, fixed_step_count: Optional[int] = None,
                   batch_size: Optional[int] = None):
        """
        Recurrent mode: returns (stacked_batch, step_sizes, metas) where
        stacked_batch holds (S, N, ...) arrays (S = padded step count) —
        the XLA-friendly replacement for the reference's per-step list
        (reference :646). Dummy steps repeat step 0 with IGNORE labels.
        `batch_size` pads short batches to a static N with IGNORE-labelled
        dummy rows (step_sizes/metas keep only the real examples).
        Single-sentence mode: one collated dict (S dim absent).
        """
        if self.recurrent:
            raw_meta = [e[1] for e in batch]
            batch_meta = [{
                "name": m[0]["name"],
                "timestamp": [d["timestamp"] for d in m],
                "gt_sentence": [d["sentence"] for d in m],
            } for m in raw_meta]
            examples = [e[0] for e in batch]
            step_sizes = [len(e) for e in examples]
            max_n_sen = max(step_sizes)
            if fixed_step_count is not None:
                s = fixed_step_count
            else:
                s = bucket_size(max_n_sen, COUNT_LADDER)
            s = max(s, max_n_sen)

            n_real = len(examples)
            n = batch_size if batch_size is not None else n_real
            assert n >= n_real
            keys = ("input_ids", "input_labels", "input_mask",
                    "token_type_ids", "video_feature")
            stacked: Dict[str, np.ndarray] = {}
            for key in keys:
                proto = examples[0][0][key]
                stacked[key] = np.zeros((s, n) + proto.shape, proto.dtype)
            for i in range(n):
                ex = examples[i] if i < n_real else examples[0]
                for step in range(s):
                    src = ex[step] if step < len(ex) else ex[0]
                    for key in keys:
                        stacked[key][step, i] = src[key]
                    if step >= len(ex) or i >= n_real:  # dummy: no loss
                        stacked["input_labels"][step, i] = IGNORE
            stacked["step_valid"] = np.asarray(
                [[step < sz for sz in step_sizes]
                 + [False] * (n - n_real) for step in range(s)], bool)
            return stacked, step_sizes, batch_meta

        # single sentence / untied; pad short batches with IGNORE dummies
        batch_meta = [{"name": e[1]["name"], "timestamp": e[1]["timestamp"],
                       "gt_sentence": e[1]["sentence"]} for e in batch]
        examples = [e[0] for e in batch]
        n_real = len(examples)
        n = batch_size if batch_size is not None else n_real
        label_key = ("text_labels" if "text_labels" in examples[0]
                     else "input_labels")
        for _ in range(n - n_real):
            dummy = dict(examples[0])
            dummy[label_key] = np.full_like(examples[0][label_key],
                                            IGNORE)
            examples.append(dummy)
        collated: Dict[str, Any] = {}
        for key, value in examples[0].items():
            if isinstance(value, np.ndarray):
                collated[key] = np.stack([d[key] for d in examples])
            else:
                collated[key] = [d[key] for d in examples]
        return collated, None, batch_meta


class CaptionBatchLoader:
    """Minimal shuffled batch loader over the caption dataset."""

    def __init__(self, dataset: RecursiveCaptionDataset, batch_size: int,
                 *, shuffle: bool, seed: int = 0,
                 fixed_shapes: bool = False) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.fixed_step_count = None
        if fixed_shapes and dataset.recurrent:
            self.fixed_step_count = max(
                len(e["sentences"]) for e in dataset.data)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
        for start in range(0, n, self.batch_size):
            idx = order[start:start + self.batch_size]
            points = [self.dataset[int(i)] for i in idx]
            yield self.dataset.collate_fn(
                points, fixed_step_count=self.fixed_step_count,
                batch_size=self.batch_size)


def create_mart_datasets_and_loaders(
        cfg, coot_feat_dir: str = "provided_embeddings",
        annotations_dir: str = "annotations",
        video_feature_dir: str = "data/mart_video_feature", *,
        seed: int = 0, fixed_shapes: bool = False):
    """Factory (reference :735). Val uses max_n_sen + 10 (reference :749)."""
    train_dataset = RecursiveCaptionDataset(
        cfg.dataset_train.name, cfg.max_t_len, cfg.max_v_len,
        cfg.max_n_sen, mode="train", recurrent=cfg.recurrent,
        untied=cfg.untied or cfg.mtrans,
        video_feature_dir=video_feature_dir,
        coot_model_name=cfg.coot_model_name, coot_mode=cfg.coot_mode,
        coot_dim_vid=cfg.coot_dim_vid, coot_dim_clip=cfg.coot_dim_clip,
        annotations_dir=annotations_dir, coot_feat_dir=coot_feat_dir,
        dataset_max=cfg.dataset_train.max_datapoints,
        preload=cfg.dataset_train.preload)
    val_dataset = RecursiveCaptionDataset(
        cfg.dataset_val.name, cfg.max_t_len, cfg.max_v_len,
        cfg.max_n_sen + cfg.max_n_sen_add_val, mode="val",
        recurrent=cfg.recurrent, untied=cfg.untied or cfg.mtrans,
        video_feature_dir=video_feature_dir,
        coot_model_name=cfg.coot_model_name, coot_mode=cfg.coot_mode,
        coot_dim_vid=cfg.coot_dim_vid, coot_dim_clip=cfg.coot_dim_clip,
        annotations_dir=annotations_dir, coot_feat_dir=coot_feat_dir,
        dataset_max=cfg.dataset_val.max_datapoints,
        preload=cfg.dataset_val.preload)
    train_loader = CaptionBatchLoader(
        train_dataset, cfg.train.batch_size,
        shuffle=cfg.dataset_train.shuffle, seed=seed,
        fixed_shapes=fixed_shapes)
    val_loader = CaptionBatchLoader(
        val_dataset, cfg.val.batch_size, shuffle=False, seed=seed,
        fixed_shapes=fixed_shapes)
    return train_dataset, val_dataset, train_loader, val_loader
