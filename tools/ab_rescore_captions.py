"""Re-score the chained caption A/B runs' saved translations through ONE
scorer path (the hermetic Bleu/METEOR-lite/Rouge/Cider stack of
coot_videotext_tpu.tasks.caption.evaluate_language), so every run on
both sides carries identically-computed language metrics regardless of
what its trainer logged live (the round-4 ref side fell into the
reference's -999 no-java METEOR path, mart/evaluate_language.py:70-78,
while the TPU side logged METEOR-lite -- the one asymmetric column).

For each run dir it scores every caption/translations_{ep}_val.json and
writes metrics/rescored_epoch_{ep}.json with cap/* keys; ab_compare.py
--task caption overlays these over the live-logged values.

Usage:
    python tools/ab_rescore_captions.py [--match yc2big_mart_ab]
"""
from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

import sys

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from coot_videotext_tpu.tasks.caption.evaluate_language import (  # noqa: E402
    evaluate_language_files)

SCORE_TO_METRIC = {
    "Bleu_1": "cap/b1", "Bleu_2": "cap/b2", "Bleu_3": "cap/b3",
    "Bleu_4": "cap/b4", "METEOR": "cap/met", "ROUGE_L": "cap/rol",
    "CIDEr": "cap/cid",
}


def rescore_run(run_dir: Path, gt_file: Path) -> int:
    done = 0
    for pred in sorted((run_dir / "caption").glob("translations_*_val.json")):
        ep = int(re.search(r"_(\d+)_val\.json$", pred.name).group(1))
        out = run_dir / "metrics" / f"rescored_epoch_{ep}.json"
        scores = evaluate_language_files(pred, [gt_file], verbose=False,
                                         all_scorer=True)
        row = {metric: float(scores[key])
               for key, metric in SCORE_TO_METRIC.items() if key in scores}
        out.write_text(json.dumps(row, indent=1), encoding="utf8")
        print(f"  ep{ep}: " + "  ".join(
            f"{k.split('/')[1]}={v:.4f}" for k, v in row.items()))
        done += 1
    return done


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--match", default="yc2big_mart_ab",
                    help="run-name substring filter")
    ap.add_argument("--gt", default="data/yc2big_caption/annotations/"
                                    "youcook2/captioning_val_para.json")
    args = ap.parse_args()

    gt_file = REPO / args.gt
    total = 0
    for base in ("experiments_ref_ab", "experiments_tpu_ab"):
        for run_dir in sorted((REPO / base).glob("caption/*/*")):
            if args.match not in run_dir.name:
                continue
            print(f"== {base}/{run_dir.name}")
            total += rescore_run(run_dir, gt_file)
    if total == 0:
        sys.exit("no translations found to rescore")


if __name__ == "__main__":
    main()
