"""
Compute retrieval on saved COOT embeddings (port of reference
test_embeddings_retrieval.py, incl. legacy-key fallback).
"""

from pathlib import Path

import h5py
import numpy as np

from coot_videotext_tpu.tasks.retrieval import eval as retrieval
from coot_videotext_tpu.utils.arguments import ArgParser

LEGACY_KEYS = {"vid_emb": "vid_norm", "par_emb": "par_norm",
               "clip_emb": "clip_norm", "sent_emb": "sent_norm"}


def main():
    parser = ArgParser(description=__doc__)
    parser.add_argument("path_to_embeddings", type=str,
                        help="Path to h5 embeddings file.")
    args = parser.parse_args()
    path = Path(args.path_to_embeddings)
    print(f"Testing retrieval on embeddings: {path}")

    with h5py.File(path, "r") as h5:
        if "vid_emb" not in h5:  # backwards compatibility
            data = {tgt: np.asarray(h5[src])
                    for tgt, src in LEGACY_KEYS.items()}
        else:
            data = {key: np.asarray(h5[key])
                    for key in ("vid_emb", "par_emb", "clip_emb",
                                "sent_emb")}

    print(retrieval.VALHEADER)
    retrieval.compute_retrieval(data, "vid_emb", "par_emb")
    retrieval.compute_retrieval(data, "clip_emb", "sent_emb")


if __name__ == "__main__":
    main()
