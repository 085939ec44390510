"""
Precomputed-feature loaders for the retrieval task.

Behavioral parity with reference coot/features_loader.py:16-195:
    - VideoFeatureLoader: h5 file `<features_name>.h5` keyed by data_key, or
      per-video npz `features/<features_name>/v_<data_key>.npz` (ActivityNet
      ICEP features); builds and caches `<features_name>_num_frames.json`
      over ALL keys in the store (load_all semantics, reference :40-47);
      optional full RAM preload.
    - TextFeaturesLoader: paragraph-level text feature h5
      `<features_name>.h5` plus `<features_name>_sentence_splits.json`
      holding per-sentence token counts used to cut paragraphs back into
      sentences; legacy `v_<key[:11]>` fallback kept (reference :152,182).

TPU-specific difference: the reference preloads into multiprocessing shared
arrays consumed by DataLoader worker processes (features_loader.py:49-52).
The TPU pipeline is a prefetch THREAD in one process, so the preload is a
plain numpy dict (no shared memory needed).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, List, Tuple, Union

import h5py
import numpy as np


class VideoFeatureLoader:
    """Load video features from h5 or per-video npz (reference :16)."""

    def __init__(self, dataset_path: Union[str, Path], features_name: str,
                 features_source: str, data_keys: List[str], *,
                 preload_vid_feat: bool = False) -> None:
        self.dataset_path = Path(dataset_path)
        self.features_name = features_name
        self.features_source = features_source
        self.data_keys = data_keys
        self.cached_data: Dict[str, np.ndarray] = {}
        self.preload_vid_feat = preload_vid_feat
        if self.features_source not in ("h5", "npz_activitynet"):
            raise NotImplementedError(
                f"Feature source type {self.features_source} "
                f"not understood.")
        self.h5_path = self.dataset_path / f"{self.features_name}.h5"
        self.npz_dir = self.dataset_path / "features" / self.features_name

        # per-video frame counts over the FULL store, cached as json
        self.num_frames_file = (
            self.dataset_path / f"{self.features_name}_num_frames.json")
        if not self.num_frames_file.is_file():
            num_frames = {key: int(data.shape[0])
                          for key, data in self.iter_all()}
            self.num_frames_file.write_text(
                json.dumps(num_frames, sort_keys=True), encoding="utf8")
        self.num_frames: Dict[str, int] = json.loads(
            self.num_frames_file.read_text(encoding="utf8"))

        if self.preload_vid_feat:
            if self.features_source == "h5":
                with h5py.File(self.h5_path, "r") as h5:
                    for key in self.data_keys:
                        self.cached_data[key] = np.asarray(
                            h5[key], dtype=np.float32)
            else:
                for key in self.data_keys:
                    self.cached_data[key] = self._load_npz(key)

    def iter_all(self):
        """Yield (key, features (T, D)) for EVERY key in the store."""
        if self.features_source == "h5":
            with h5py.File(self.h5_path, "r") as h5:
                for key in h5.keys():
                    yield key, h5[key]
        else:
            for file in os.listdir(self.npz_dir):
                data_key = file[2:-4]  # v_<ytid>.npz -> <ytid>
                yield data_key, self._load_npz(data_key)

    def _load_npz(self, data_key: str) -> np.ndarray:
        """ActivityNet ICEP npz (reference :70-73)."""
        file = self.npz_dir / f"v_{data_key}.npz"
        return np.load(str(file))["frame_scores"].squeeze(1).squeeze(
            2).squeeze(2)

    def __getitem__(self, key: str) -> np.ndarray:
        assert key in self.num_frames or key in self.cached_data, (
            f"Video features for datapoint {key} not found.")
        if key in self.cached_data:
            return self.cached_data[key]
        if self.features_source == "h5":
            with h5py.File(self.h5_path, "r") as h5:
                return np.asarray(h5[key], dtype=np.float32)
        return self._load_npz(key)


class TextFeaturesLoader:
    """Load paragraph text features + sentence splits (reference :125)."""

    def __init__(self, dataset_path: Union[str, Path], features_name: str,
                 features_source: str, keys: List[str], *,
                 preload_text_feat: bool = False) -> None:
        assert features_source == "h5", (
            f"Text feature source {features_source} not implemented.")
        self.features_file = Path(dataset_path) / f"{features_name}.h5"
        splits_file = (Path(dataset_path) /
                       f"{features_name}_sentence_splits.json")
        self.data_keys = keys
        self.cached_data: Dict[str, np.ndarray] = {}
        self.preload_text_feat = preload_text_feat
        self.sentence_splits: Dict[str, List[int]] = json.loads(
            splits_file.read_text(encoding="utf8"))

        if self.preload_text_feat:
            with h5py.File(self.features_file, "r") as h5:
                for key in self.data_keys:
                    self.cached_data[key] = np.asarray(
                        h5[self._resolve_key(h5, key)], dtype=np.float32)

    def _resolve_key(self, h5, key: str) -> str:
        """Legacy `v_<id[:11]>` fallback (reference :152)."""
        if key in h5:
            return key
        old_key = f"v_{key[:11]}"
        if old_key in h5:
            return old_key
        raise KeyError(
            f"Key {key} not found in {self.features_file}. Keys look "
            f"like: {list(h5.keys())[:10]}, ...")

    def __getitem__(self, key: str) -> Tuple[np.ndarray, List[int]]:
        """Returns (paragraph features (T, D), per-sentence token counts)."""
        assert key in self.data_keys, (
            f"Text features for datapoint {key} not found.")
        if key in self.cached_data:
            feats = self.cached_data[key]
            resolved = key if key in self.sentence_splits else f"v_{key[:11]}"
        else:
            with h5py.File(self.features_file, "r") as h5:
                resolved = self._resolve_key(h5, key)
                feats = np.asarray(h5[resolved], dtype=np.float32)
        if resolved in self.sentence_splits:
            return feats, self.sentence_splits[resolved]
        return feats, self.sentence_splits[f"v_{key[:11]}"]
