"""
Generate MART caption annotations for the yc2big videos whose words are
PARTIALLY determined by the raw clip features — the caption half of the
reference-scale A/B chain (retrieval trains on data/yc2big, exports COOT
embeddings, MART trains on those embeddings against THESE captions).

Why this construction can fail (unlike the saturating capsynth A/B,
round-3 verdict #2): each content word is the argmax of a fixed random
projection of the clip's mean raw feature plus Gumbel noise at a
temperature calibrated so ~`word_noise` of the words flip to something
feature-independent. A perfect captioner therefore tops out near
(1-word_noise) unigram precision (BLEU-4 ceiling ~(1-word_noise)^4),
and the words depend on the 4096-dim raw features only through whatever
the 1152-dim COOT embeddings preserved — so decode metrics move with
embedding quality, which is exactly what the A/B compares.

Output layout (MART contract, reference recursive_caption_dataset.py):
  data/yc2big_caption/annotations/youcook2/
      captioning_train.json, captioning_val.json,
      captioning_val_para.json, mart_word2idx.json, .synthetic
The COOT embedding h5s are NOT produced here — they are exported by the
trained retrieval models of each A/B side (train_retrieval.py
--validate --save_embeddings; reference coot/trainer_retrieval.py:404).

Deterministic for the seed. Usage: python data_gen_yc2big_captions.py
"""

from __future__ import annotations

import json
from pathlib import Path

import h5py
import numpy as np

REPO = Path(__file__).resolve().parent
SPECIALS = ("[PAD]", "[CLS]", "[SEP]", "[VID]", "[BOS]", "[EOS]", "[UNK]")


def calibrate_temperature(logits: np.ndarray, rng, target_flip: float,
                          n_probe: int = 2000) -> float:
    """Binary-search the Gumbel temperature so that `target_flip` of the
    argmax picks differ from the noise-free ones (probed on a sample)."""
    probe = logits[rng.choice(len(logits), size=min(n_probe, len(logits)),
                              replace=False)]
    clean = probe.argmax(-1)
    gumbel = -np.log(-np.log(rng.uniform(1e-12, 1.0, probe.shape)))
    lo, hi = 1e-4, 1e4
    for _ in range(40):
        mid = np.sqrt(lo * hi)
        flip = float(((probe + mid * gumbel).argmax(-1) != clean).mean())
        if flip < target_flip:
            lo = mid
        else:
            hi = mid
    return float(np.sqrt(lo * hi))


def main(*, dataset: str = "yc2big", out_name: str = "yc2big_caption",
         vocab_words: int = 400, words_per_sentence: int = 6,
         word_noise: float = 0.25, seed: int = 0) -> dict:
    rng = np.random.RandomState(seed)
    data_dir = REPO / "data" / dataset
    meta = json.loads((data_dir / "meta_all.json").read_text("utf8"))

    ann_dir = REPO / "data" / out_name / "annotations" / "youcook2"
    ann_dir.mkdir(parents=True, exist_ok=True)
    (ann_dir / ".synthetic").write_text(
        "data_gen_yc2big_captions.py output\n", encoding="utf8")

    # fixed per-position projections from raw-feature space to word logits
    with h5py.File(data_dir / "video_feat_2d3d.h5", "r") as h5:
        feat_dim = h5[next(iter(h5.keys()))].shape[1]
    proj = rng.randn(words_per_sentence, vocab_words,
                     feat_dim).astype(np.float32) / np.sqrt(feat_dim)

    # pass 1: collect every clip's mean feature and its clean logits
    keys = sorted(meta.keys())
    clip_feats = {}
    with h5py.File(data_dir / "video_feat_2d3d.h5", "r") as h5:
        for key in keys:
            item = meta[key]
            frames = np.asarray(h5[item["data_key"]], np.float32)
            fps = len(frames) / item["duration_sec"]
            means = []
            for seg in item["segments"]:
                a = int(np.floor(fps * seg["start_sec"]))
                b = max(a + 1, int(np.ceil(fps * seg["stop_sec"])))
                seg_mean = frames[a:min(b, len(frames))].mean(0)
                means.append(seg_mean / (np.linalg.norm(seg_mean) + 1e-6))
            clip_feats[key] = np.stack(means)

    all_means = np.concatenate([clip_feats[k] for k in keys], axis=0)
    logits = np.einsum("cd,pvd->cpv", all_means, proj)
    temp = calibrate_temperature(
        logits.reshape(-1, vocab_words), rng, word_noise)

    # vocabulary MUST be purely alphabetic: the reference's evaluator
    # preprocesses with parse_sent = re.sub('[^a-zA-Z]',' ',...) (mart/
    # evaluate_language.py:33-36, reproduced by our hermetic evaluator),
    # which collapses digit-bearing tokens like "word011" all to "word"
    # and saturates BLEU at ~0.96 regardless of model quality (observed).
    # Three lowercase letters per word keeps 400 distinct tokens.
    words = [chr(97 + i // 676) + chr(97 + (i // 26) % 26)
             + chr(97 + i % 26) for i in range(vocab_words)]
    word2idx = {s: i for i, s in enumerate(SPECIALS)}
    for w in words + ["."]:
        word2idx.setdefault(w, len(word2idx))
    (ann_dir / "mart_word2idx.json").write_text(json.dumps(word2idx),
                                                encoding="utf8")

    splits = {"train": {}, "val": {}}
    flips = total = 0
    row = 0
    for key in keys:
        item = meta[key]
        sentences, timestamps = [], []
        for seg in item["segments"]:
            lg = logits[row]
            row += 1
            gumbel = -np.log(-np.log(
                rng.uniform(1e-12, 1.0, lg.shape)))
            picks = (lg + temp * gumbel).argmax(-1)
            flips += int((picks != lg.argmax(-1)).sum())
            total += picks.size
            sentences.append(" ".join(words[p] for p in picks) + " .")
            timestamps.append([seg["start_sec"], seg["stop_sec"]])
        splits[item["split"]][key] = {
            "duration": item["duration_sec"],
            "timestamps": timestamps, "sentences": sentences}

    for split, data in splits.items():
        (ann_dir / f"captioning_{split}.json").write_text(
            json.dumps(data), encoding="utf8")
    para = {k: " ".join(v["sentences"]).replace(" .", ".")
            for k, v in splits["val"].items()}
    (ann_dir / "captioning_val_para.json").write_text(
        json.dumps(para), encoding="utf8")

    info = {
        "annotations_dir": str(ann_dir.parent),
        "vocab_size": len(word2idx),
        "train_videos": len(splits["train"]),
        "val_videos": len(splits["val"]),
        "word_noise_target": word_noise,
        "word_noise_measured": round(flips / total, 4),
        "gumbel_temperature": round(temp, 6),
    }
    print(json.dumps(info))
    return info


if __name__ == "__main__":
    main()
