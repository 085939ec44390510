"""
Build vocabulary + GloVe embedding cache for MART captioning
(port of reference mart_build_vocab.py): looks up each word of
annotations/<dset>/mart_word2idx.json in a raw GloVe txt file and stores
the (vocab_size, 300) matrix as cache_caption/<dset>_vocab_glove.pt.

Note (as in the reference, _unused_build_vocab_idx docstring): the
word2idx files shipped in annotations/ are frozen — rebuilding them from
captions produces a different word order, so only the GloVe extraction is
exposed; a compatible builder is provided for new datasets.
"""

import argparse
import json
from collections import Counter
from pathlib import Path
from typing import Dict

import numpy as np

from coot_videotext_tpu.data.caption_dataset import (
    RecursiveCaptionDataset as RCDataset, word_tokenize)


def load_glove(filename) -> Dict[str, np.ndarray]:
    """(reference :32)."""
    glove = {}
    with open(filename, encoding="utf-8") as f:
        for line in f.readlines():
            values = line.strip("\n").split(" ")
            glove[values[0]] = np.asarray(
                [float(e) for e in values[1:]])
    return glove


def extract_glove(word2idx: Dict[str, int], raw_glove_path: str,
                  vocab_glove_path: str, glove_dim: int = 300) -> None:
    """GloVe lookup for each vocab word (reference :47-70). Words not in
    GloVe get random-normal vectors, matching the reference."""
    import torch as th
    print(f"Loading glove embedding at path: {raw_glove_path}.")
    glove_full = load_glove(raw_glove_path)
    print("Glove loaded, building vocab matrix.")
    idx2word = {int(i): w for w, i in word2idx.items()}
    vocab_size = len(idx2word)
    glove_matrix = np.zeros((vocab_size, glove_dim), np.float32)
    glove_keys = glove_full.keys()
    missing = 0
    for i in range(vocab_size):
        w = idx2word[i]
        if w in glove_keys:
            glove_matrix[i] = glove_full[w]
        else:
            glove_matrix[i] = np.random.randn(glove_dim) * 0.4
            missing += 1
    print(f"Vocab embedding size {glove_matrix.shape}, "
          f"{missing} words missing from GloVe.")
    th.save(glove_matrix, vocab_glove_path)
    print(f"Saved to {vocab_glove_path}")


def build_vocab_idx(annotations_file: str, min_word_count: int = 3
                    ) -> Dict[str, int]:
    """Word2idx builder for NEW datasets (the shipped files are frozen;
    reference _unused_build_vocab_idx)."""
    data = json.loads(Path(annotations_file).read_text(encoding="utf8"))
    counter: Counter = Counter()
    for item in data.values():
        for sen in item["sentences"]:
            counter.update(word_tokenize(sen.lower()))
    word2idx = {RCDataset.PAD_TOKEN: 0, RCDataset.CLS_TOKEN: 1,
                RCDataset.SEP_TOKEN: 2, RCDataset.VID_TOKEN: 3,
                RCDataset.BOS_TOKEN: 4, RCDataset.EOS_TOKEN: 5,
                RCDataset.UNK_TOKEN: 6}
    for word, count in sorted(counter.items()):
        if count >= min_word_count and word not in word2idx:
            word2idx[word] = len(word2idx)
    return word2idx


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dset_name", type=str,
                        choices=["activitynet", "youcook2"])
    parser.add_argument("--raw_glove_path", type=str,
                        default="data/glove.6B.300d.txt")
    parser.add_argument("--annotations_dir", type=str,
                        default="annotations")
    parser.add_argument("--cache_dir", type=str, default="cache_caption")
    args = parser.parse_args()

    word2idx_file = (Path(args.annotations_dir) / args.dset_name /
                     "mart_word2idx.json")
    word2idx = json.loads(word2idx_file.read_text(encoding="utf8"))
    print(f"WORD2IDX: {word2idx_file} len {len(word2idx)}")
    Path(args.cache_dir).mkdir(parents=True, exist_ok=True)
    vocab_glove_path = (Path(args.cache_dir) /
                        f"{args.dset_name}_vocab_glove.pt")
    extract_glove(word2idx, args.raw_glove_path, str(vocab_glove_path))


if __name__ == "__main__":
    main()
