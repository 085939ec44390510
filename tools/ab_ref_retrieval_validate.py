"""Run the REFERENCE retrieval side in VALIDATE + save-embeddings mode
(the export half of the chained caption A/B — reference
coot/trainer_retrieval.py:404-415 writes the embeddings h5). `--split
train` points the reference's val dataset at the train split via its
own `-o` config-override mechanism, which is how the reference's README
workflow produced COOT embeddings for MART training.

Usage: python tools/ab_ref_retrieval_validate.py --run refbigs0 \
           [--split val|train] [--config ...]
"""
from __future__ import annotations

import argparse
import os
import runpy
import sys

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
REF = "/root/reference"

sys.path.insert(0, TOOLS)
from ab_reference_retrieval import install_shims  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="refbigs0")
    ap.add_argument("--seed", default="0")
    ap.add_argument("--split", default="val", choices=["val", "train"])
    ap.add_argument("--config",
                    default="config/retrieval/ab/yc2big_ab.yaml")
    args = ap.parse_args()

    install_shims()
    os.chdir(REPO)
    argv = [
        "train_retrieval.py",
        "-c", os.path.join(REPO, args.config),
        "--data_path", os.path.join(REPO, "data"),
        "--log_dir", os.path.join(REPO, "experiments_ref_ab"),
        "--workers", "0", "--seed", args.seed,
        "--run_name", args.run,
        "--validate", "--save_embeddings",
    ]
    if args.split != "val":
        argv += ["-o", f"dataset_val.split={args.split}"]
    sys.argv = argv
    runpy.run_path(os.path.join(REF, "train_retrieval.py"),
                   run_name="__main__")


if __name__ == "__main__":
    main()
