"""
Hermetic test for the S3D feature-extraction driver
(extract_100m_features.py, reference extract_100m_features.py:54-162):
window slicing (kernel/stride, tail handling), batching, h5 append and
skip-existing logic — with cheap eval_shape-built parameters and an
eager forward (the S3D model's numerics are covered by tests/test_s3d.py;
full init/compile of the 60-conv backbone costs minutes on CPU).
"""

import json
import sys
from pathlib import Path

import h5py
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def frames_root(tmp_path):
    Image = pytest.importorskip("PIL.Image")
    rng = np.random.RandomState(0)
    counts = {"vidA": 40, "vidB": 20, "vidC": 5}  # 5 < kernel: tail case
    for vid, n in counts.items():
        d = tmp_path / "frames" / vid
        d.mkdir(parents=True)
        for i in range(n):
            arr = rng.randint(0, 255, (32, 32, 3), np.uint8)
            Image.fromarray(arr).save(d / f"frame_{i + 1:010d}.jpg")
    return tmp_path / "frames", counts


def test_extract_100m_driver(frames_root, tmp_path, monkeypatch):
    import extract_100m_features as tool
    from coot_videotext_tpu.models.s3d import S3D

    frames_path, counts = frames_root

    # cheap parameters: trace shapes only, fill positive numpy values
    real_init = S3D.init

    def fake_init(self, rng, sample):
        shapes = jax.eval_shape(lambda r: real_init(self, r, sample), rng)
        np_rng = np.random.RandomState(0)

        def fill(path, s):
            name = path[-1].key
            if name == "kernel":
                v = 0.05 * np_rng.standard_normal(s.shape)
            elif name == "var":
                v = np.full(s.shape, 1.0)
            elif name in ("scale", "weight"):
                v = np.ones(s.shape)
            else:
                v = np.zeros(s.shape)
            return jnp.asarray(v.astype(np.float32))

        return jax.tree_util.tree_map_with_path(fill, shapes)

    monkeypatch.setattr(S3D, "init", fake_init)
    monkeypatch.setattr(jax, "jit", lambda f, **kw: f)  # eager forward

    out_h5 = tmp_path / "out" / "video_feat_100m.h5"
    kernel, stride = 16, 8
    monkeypatch.setattr(sys, "argv", [
        "extract_100m_features.py", str(frames_path), str(out_h5),
        "--kernel", str(kernel), "--stride", str(stride),
        "--batch_size", "4", "--checkpoint", "does_not_exist.pth"])
    tool.main()

    with h5py.File(out_h5) as f:
        assert set(f.keys()) == set(counts)
        # windows: ceil over stride positions, short tails padded from
        # the end when num_frames > kernel, single window otherwise
        for vid, n in counts.items():
            feats = f[vid][:]
            if n <= kernel:
                expected = 1
            else:
                expected = len([p for p in range(0, n, stride)
                                if p + kernel <= n or n > kernel])
            assert feats.shape[0] == expected, (vid, feats.shape)
            assert feats.shape[1] == 512  # video_embedding
            assert np.isfinite(feats).all()

    # second run skips existing keys (resume contract)
    mtime = out_h5.stat().st_mtime_ns
    tool.main()
    with h5py.File(out_h5) as f:
        assert set(f.keys()) == set(counts)
