"""Beam decode quality A/B: fixed beam (default) vs reference-compat.

The production beam (`translate_batch_beam(reference_compat=False)`)
intentionally fixes two reference decode bugs (UNK suppressed on the
position axis instead of the token axis, rows reordered only on
finish steps — reference mart/translator.py:133,146); parity mode
reproduces them bit for bit. This tool backs the documented divergence
(PARITY.md §2.4) with numbers: train one MART model on the seeded
capsynth dataset, then decode the val split with BOTH beam modes (and
greedy as the anchor) from the same weights, scoring each with the
hermetic caption metrics.

Usage: python tools/ab_beam_compat.py [--epochs N] [--log_dir DIR]
Writes the score table to stdout and docs/ab_evidence/beam_compat.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--log_dir", default="experiments_beam_ab")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tag", default="",
                    help="suffix for the evidence filename, e.g. "
                         "'_undertrained' for a low-epoch decode point")
    args = ap.parse_args()
    os.chdir(REPO)

    from coot_videotext_tpu.data.caption_dataset import (
        create_mart_datasets_and_loaders)
    from coot_videotext_tpu.tasks.caption.config import MartConfig
    from coot_videotext_tpu.tasks.caption.model_manager import (
        MartModelManager, create_mart_model)
    from coot_videotext_tpu.tasks.caption.trainer import MartTrainer
    from coot_videotext_tpu.utils.yaml_utils import load_yaml_config_file

    cfg_dict = load_yaml_config_file(
        REPO / "config/caption/ab/capsynth_ab.yaml")
    cfg_dict["train"]["num_epochs"] = args.epochs
    cfg = MartConfig(cfg_dict)
    cfg.random_seed = args.seed

    train_set, _, train_loader, val_loader = \
        create_mart_datasets_and_loaders(
            cfg, "data/capsynth_ab/provided_embeddings",
            "data/capsynth_ab/annotations", "unused", seed=args.seed)
    model = create_mart_model(cfg, len(train_set.word2idx), verbose=False)
    mgr = MartModelManager(cfg, model)
    trainer = MartTrainer(cfg, mgr, "default", "capsynth_beam",
                          f"s{args.seed}", len(train_loader),
                          log_dir=args.log_dir,
                          annotations_dir="data/capsynth_ab/annotations",
                          reset=True)
    trainer.train_model(train_loader, val_loader)

    results = {}
    for mode, use_beam, compat in (("greedy", False, False),
                                   ("beam_fixed", True, False),
                                   ("beam_compat", True, True)):
        cfg.use_beam = use_beam
        cfg.beam_reference_compat = compat
        _, _, _, flat = trainer.validate_epoch(val_loader)
        results[mode] = {k: float(flat[k]) for k in
                         ("Bleu_4", "CIDEr", "ROUGE_L", "METEOR")
                         if k in flat}
        print(f"{mode}: " + ", ".join(
            f"{k}={v:.4f}" for k, v in results[mode].items()))

    out = REPO / f"docs/ab_evidence/beam_compat{args.tag}.json"
    out.write_text(json.dumps(
        {"config": "config/caption/ab/capsynth_ab.yaml",
         "epochs": args.epochs, "seed": args.seed,
         "results": results}, indent=1), encoding="utf8")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
