"""Orchestrate the chained caption A/B (round-4 plan, VERDICT #3):

  1. `export`: run BOTH splits through each side's own trained yc2big
     retrieval model in validate+save-embeddings mode (ours:
     train_retrieval.py --validate --save_embeddings; reference: its
     train_retrieval.py via the runpy shim runner) and install the h5s
     as data/yc2big_caption/embeddings_<side>/yc2bigcoot_{train,val}.h5
     — the layout mart's recursive caption dataset expects
     (reference mart/recursive_caption_dataset.py:296,182-201).
  2. `train`: launch MART (config/caption/ab/yc2big_mart_ab.yaml) on the
     side's own embeddings against the shared noisy captions of
     data_gen_yc2big_captions.py.

Usage:
    python tools/ab_chain_captions.py export --side tpu
    python tools/ab_chain_captions.py export --side ref
    python tools/ab_chain_captions.py train --side tpu
    python tools/ab_chain_captions.py train --side ref

Run `export` only after the side's yc2big retrieval training finished
(it loads the best checkpoint). Each side consumes ITS OWN retrieval
embeddings, so the caption metrics compare the full pipelines
end-to-end, not just the captioner.
"""
from __future__ import annotations

import argparse
import glob
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = "config/retrieval/ab/yc2big_ab.yaml"
CAPTION_CONFIG = "config/caption/ab/yc2big_mart_ab.yaml"
RUNS = {"tpu": ("experiments_tpu_ab", "tpubigs01"),
        "ref": ("experiments_ref_ab", "refbigs01")}


def _emb_dir(side: str) -> str:
    log_dir, run = RUNS[side]
    return os.path.join(REPO, log_dir, "retrieval", "default",
                        f"yc2big_ab_{run}", "embeddings")


def _newest(pattern: str) -> str:
    files = sorted(glob.glob(pattern), key=os.path.getmtime)
    if not files:
        raise FileNotFoundError(f"no file matches {pattern}")
    return files[-1]


def export_side(side: str) -> None:
    log_dir, run = RUNS[side]
    out_dir = os.path.join(REPO, "data", "yc2big_caption",
                           f"embeddings_{side}")
    os.makedirs(out_dir, exist_ok=True)
    for split in ("val", "train"):
        before = set(glob.glob(os.path.join(_emb_dir(side), "*.h5")))
        if side == "tpu":
            cmd = [sys.executable, "train_retrieval.py",
                   "-c", CONFIG, "--data_path", "data",
                   "--log_dir", log_dir, "--workers", "0", "--seed", "0",
                   "--run_name", run[:-1], "--validate",
                   "--save_embeddings", "--preload",
                   "-o", f"dataset_val.split={split}"]
        else:
            cmd = [sys.executable, "tools/ab_ref_retrieval_validate.py",
                   "--run", run[:-1], "--split", split]
        print(f"[chain] export {side}/{split}: {' '.join(cmd[1:])}",
              flush=True)
        rc = subprocess.call(cmd, cwd=REPO)
        if rc != 0:
            sys.exit(f"[chain] export {side}/{split} failed rc={rc}")
        new = set(glob.glob(os.path.join(_emb_dir(side), "*.h5"))) - before
        src = max(new, key=os.path.getmtime) if new else _newest(
            os.path.join(_emb_dir(side), "embeddings_*.h5"))
        dst = os.path.join(out_dir, f"yc2bigcoot_{split}.h5")
        shutil.copyfile(src, dst)
        print(f"[chain] {src} -> {dst}", flush=True)


def train_side(side: str, seed: int) -> None:
    feat_dir = os.path.join("data", "yc2big_caption",
                            f"embeddings_{side}")
    ann_dir = os.path.join("data", "yc2big_caption", "annotations")
    run = f"{'tpu' if side == 'tpu' else 'ref'}capbig{seed}"
    if side == "tpu":
        cmd = [sys.executable, "train_caption.py",
               "-c", CAPTION_CONFIG,
               "--annotations_dir", ann_dir,
               "--coot_feat_dir", feat_dir,
               "--log_dir", "experiments_tpu_ab",
               "--workers", "0", "--seed", str(seed), "--reset",
               "--run_name", run]
    else:
        cmd = [sys.executable, "tools/ab_reference_caption.py",
               "--config", CAPTION_CONFIG,
               "--annotations_dir", ann_dir,
               "--coot_feat_dir", feat_dir,
               "--run", run, "--seed", str(seed)]
    print(f"[chain] train {side}: {' '.join(cmd[1:])}", flush=True)
    sys.exit(subprocess.call(cmd, cwd=REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("step", choices=["export", "train"])
    ap.add_argument("--side", choices=["tpu", "ref"], required=True)
    ap.add_argument("--seed", type=int, default=0,
                    help="MART training seed; the run name becomes "
                         "<side>capbig<seed> (both A/B seeds train on "
                         "the side's ONE exported embedding set)")
    args = ap.parse_args()
    if args.step == "export":
        export_side(args.side)
    else:
        train_side(args.side, args.seed)


if __name__ == "__main__":
    main()
