"""
Sanity tests over the REAL annotation/vocab assets shipped in-repo
(annotations/, cache_caption/ — the reference's released data files,
reference /root/reference/annotations, mart/caption_eval_tools.py):
vocabulary sizes, GloVe cache shape, ground-truth paragraph files, the
duration CSV, and a self-evaluation of the hermetic caption scorers on
real ground truth.
"""

import csv
import json
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def test_word2idx_vocabularies():
    for dset, size in (("youcook2", 992), ("activitynet", 4408)):
        w2i = json.load(
            (REPO / "annotations" / dset / "mart_word2idx.json").open())
        assert len(w2i) == size
        for tok in ("[PAD]", "[CLS]", "[SEP]", "[VID]", "[BOS]", "[EOS]",
                    "[UNK]"):
            assert tok in w2i, tok
        assert w2i["[PAD]"] == 0


def test_glove_cache_matches_vocab():
    torch = pytest.importorskip("torch")
    from coot_videotext_tpu.tasks.caption.model_manager import (
        load_glove_matrix)
    mat = load_glove_matrix(str(REPO / "cache_caption"), "youcook2")
    assert mat.shape == (992, 300)
    assert np.isfinite(mat).all()
    # real vectors, not an all-zero stub
    assert float(np.abs(mat).mean()) > 0.01


def test_reference_files_exist_and_parse():
    """The *_para.json GT files are flat {video_id: paragraph} maps
    (what evaluate_language.import_ground_truths consumes)."""
    from coot_videotext_tpu.tasks.caption.eval_tools import (
        get_reference_files)
    for dset, split in (("youcook2", "val"), ("activitynet", "val"),
                        ("activitynet", "test")):
        for path in get_reference_files(dset, REPO / "annotations")[split]:
            gt = json.load(path.open())
            assert len(gt) > 100, path
            para = next(iter(gt.values()))
            assert isinstance(para, str) and len(para) > 10


def test_duration_csv_parses():
    """Headerless vid_name,duration,n_frames rows — the format the
    frame<->second table builder consumes (data/caption_dataset.py,
    reference recursive_caption_dataset.py:209-226)."""
    path = (REPO / "annotations" / "youcook2" /
            "captioning_video_feat_duration.csv")
    with path.open() as fh:
        rows = [line.strip().split(",") for line in fh if line.strip()]
    assert len(rows) > 1000
    for name, dur, nframes in rows[:20]:
        assert float(dur) > 0 and int(nframes) > 0


def test_scorers_on_real_ground_truth():
    """Feeding the real YouCook2 val GT to the hermetic scorers as its own
    prediction must give (near-)perfect BLEU4/ROUGE-L and large CIDEr;
    a shuffled prediction must score much worse."""
    from coot_videotext_tpu.tasks.caption.metrics.bleu import Bleu
    from coot_videotext_tpu.tasks.caption.metrics.cider import Cider
    from coot_videotext_tpu.tasks.caption.metrics.rouge import Rouge

    gt = json.load((REPO / "annotations" / "youcook2" /
                    "captioning_val_para.json").open())
    keys = sorted(gt)[:80]
    gts = {k: [gt[k]] for k in keys}
    res = {k: gts[k] for k in keys}
    bleu, _ = Bleu(4).compute_score(gts, res)
    rouge, _ = Rouge().compute_score(gts, res)
    cider, _ = Cider().compute_score(gts, res)
    assert bleu[3] > 0.99
    assert rouge > 0.99
    assert cider > 5.0  # idf-weighted; self-eval is far above any model
    shuffled = {k: res[keys[(i + 7) % len(keys)]]
                for i, k in enumerate(keys)}
    cider_bad, _ = Cider().compute_score(gts, shuffled)
    assert cider_bad < cider * 0.5
