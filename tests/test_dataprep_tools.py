"""
Tests for the data-preparation tools over the REAL annotation assets
shipped in-repo (annotations/): the meta_all.json builders for both
datasets (reference data_read_*_meta.py) and the GloVe vocab cache
builder (reference mart_build_vocab.py).
"""

import json
import os
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(autouse=True)
def repo_cwd(monkeypatch):
    # the meta builders read annotations/ relative to the working dir
    monkeypatch.chdir(REPO)


def test_data_read_youcook2_meta(tmp_path, monkeypatch):
    import data_read_youcook2_meta as tool
    monkeypatch.setattr(sys, "argv",
                        ["x", "--data_path", str(tmp_path)])
    tool.main()
    meta = json.loads(
        (tmp_path / "youcook2" / "meta_all.json").read_text())
    assert len(meta) == 1790  # youcookii_annotations_trainval.json
    splits = {v["split"] for v in meta.values()}
    assert splits == {"train", "val"}
    one = next(iter(meta.values()))
    assert {"data_key", "duration_sec", "split", "segments"} <= set(one)
    for v in meta.values():
        assert v["duration_sec"] > 0
        for seg in v["segments"]:
            assert seg["stop_sec"] > seg["start_sec"]
            assert seg["text"]


def test_data_read_activitynet_meta(tmp_path, monkeypatch):
    import data_read_activitynet_meta as tool
    monkeypatch.setattr(sys, "argv",
                        ["x", "--data_path", str(tmp_path)])
    tool.main()
    meta = json.loads(
        (tmp_path / "activitynet" / "meta_all.json").read_text())
    assert len(meta) > 14000
    splits = {v["split"] for v in meta.values()}
    assert splits == {"train", "val_1", "val_2"}
    # keys are <ytid>_<split>, data_key has the v_ prefix stripped
    key, v = next(iter(meta.items()))
    assert key.endswith(("_train", "_val_1", "_val_2"))
    assert not v["data_key"].startswith("v_")
    # inverted source timestamps must come out swapped (reference
    # data_read_activitynet_meta.py:48-54)
    for v in meta.values():
        for seg in v["segments"]:
            assert seg["stop_sec"] >= seg["start_sec"]


def test_build_vocab_idx_real_annotations():
    """Vocabulary builder over the real YouCook2 caption training file:
    must contain the special tokens at fixed ids and cover (nearly) the
    frozen shipped vocabulary's words."""
    from mart_build_vocab import build_vocab_idx
    w2i = build_vocab_idx(
        str(REPO / "annotations" / "youcook2" / "captioning_train.json"))
    assert w2i["[PAD]"] == 0 and w2i["[UNK]"] == 6
    shipped = json.loads(
        (REPO / "annotations" / "youcook2" /
         "mart_word2idx.json").read_text())
    ours = set(w2i)
    theirs = set(shipped)
    # the frozen file's word ORDER is irreproducible (reference
    # docstring), but the word SET from the same data/min-count should
    # agree almost perfectly
    overlap = len(ours & theirs) / len(theirs)
    assert overlap > 0.95, overlap


def test_extract_glove_roundtrip(tmp_path):
    from mart_build_vocab import extract_glove
    import torch
    glove_txt = tmp_path / "glove.txt"
    dim = 5
    words = {"the": 1.0, "a": 2.0, "person": 3.0}
    lines = [w + " " + " ".join(str(v + i / 10) for i in range(dim))
             for w, v in words.items()]
    glove_txt.write_text("\n".join(lines))
    w2i = {"[PAD]": 0, "the": 1, "person": 2, "zzznotinglove": 3}
    out = tmp_path / "vocab_glove.pt"
    np.random.seed(0)
    extract_glove(w2i, str(glove_txt), str(out), glove_dim=dim)
    mat = torch.load(str(out), weights_only=False)
    mat = np.asarray(mat)
    assert mat.shape == (4, dim)
    np.testing.assert_allclose(mat[1], [1.0 + i / 10 for i in range(dim)])
    np.testing.assert_allclose(mat[2], [3.0 + i / 10 for i in range(dim)])
    assert np.abs(mat[3]).sum() > 0  # missing word gets a random vector
