"""
ActivityNet-style per-video npz feature loading (reference
coot/features_loader.py:68-72: `v_<key>.npz` holding `frame_scores` of
shape (T, 1, D, 1, 1)) — equivalence with the h5 path end-to-end through
the retrieval dataset.
"""

import json

import h5py
import numpy as np
import pytest

from coot_videotext_tpu.data.features_loader import VideoFeatureLoader
from coot_videotext_tpu.data.synthetic import generate_retrieval_dataset


def _data_keys(base):
    meta = json.loads((base / "meta_all.json").read_text("utf8"))
    return sorted({v["data_key"] for v in meta.values()})


@pytest.fixture(scope="module")
def npz_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("npzdata")
    overrides = generate_retrieval_dataset(
        root, num_videos=6, num_val_videos=2, vid_feat_dim=32,
        text_feat_dim=24, mean_clips=2.5, max_clips=4, seed=3)
    base = root / "synth"
    # mirror the h5 features into the reference's npz layout
    npz_dir = base / "features" / "video_feat_synth"
    npz_dir.mkdir(parents=True)
    with h5py.File(base / "video_feat_synth.h5", "r") as h5:
        for key in h5.keys():
            feat = np.asarray(h5[key], np.float32)
            frame_scores = feat[:, None, :, None, None]
            np.savez(npz_dir / f"v_{key}.npz", frame_scores=frame_scores)
    return root, overrides


def test_npz_matches_h5(npz_dataset):
    root, _ = npz_dataset
    base = root / "synth"
    keys = _data_keys(base)
    h5_loader = VideoFeatureLoader(base, "video_feat_synth", "h5", keys,
                                   preload_vid_feat=False)
    npz_loader = VideoFeatureLoader(base, "video_feat_synth",
                                    "npz_activitynet", keys,
                                    preload_vid_feat=False)
    assert set(h5_loader.num_frames) == set(npz_loader.num_frames)
    for key in h5_loader.num_frames:
        np.testing.assert_allclose(h5_loader[key], npz_loader[key],
                                   rtol=0, atol=0)


def test_npz_num_frames_cache_and_preload(npz_dataset):
    root, _ = npz_dataset
    base = root / "synth"
    loader = VideoFeatureLoader(base, "video_feat_synth",
                                "npz_activitynet", _data_keys(base),
                                preload_vid_feat=True)
    cache = json.loads(
        (base / "video_feat_synth_num_frames.json").read_text("utf8"))
    key = next(iter(loader.num_frames))
    assert cache[key] == loader[key].shape[0]
    assert key in loader.cached_data  # preloaded


def test_npz_through_retrieval_dataset(npz_dataset):
    """Full datapoint equivalence h5 vs npz through RetrievalDataset."""
    from coot_videotext_tpu.data.retrieval_dataset import RetrievalDataset
    from coot_videotext_tpu.tasks.retrieval.config import RetrievalConfig
    from tests.helpers import retrieval_config_dict

    root, overrides = npz_dataset
    cfg_d = retrieval_config_dict(
        dict(overrides, vid_feat_dim=32, text_feat_dim=24))
    cfg_h5 = RetrievalConfig(cfg_d)
    ds_h5 = RetrievalDataset(cfg_h5.dataset_val, str(root))

    cfg_d2 = retrieval_config_dict(
        dict(overrides, vid_feat_dim=32, text_feat_dim=24,
             vid_feat_source="npz_activitynet"))
    cfg_npz = RetrievalConfig(cfg_d2)
    ds_npz = RetrievalDataset(cfg_npz.dataset_val, str(root))

    assert ds_h5.keys == ds_npz.keys
    a = ds_h5[0]
    b = ds_npz[0]
    np.testing.assert_allclose(a["vid_feat"], b["vid_feat"])
    for ca, cb in zip(a["clip_feats"], b["clip_feats"]):
        np.testing.assert_allclose(ca, cb)
