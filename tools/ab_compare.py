"""Compare the reference-vs-TPU A/B runs on yc2like (PARITY.md).

Reads the per-epoch metrics jsons both trainers write (identical schema,
nntrainer metric.py names) and prints a side-by-side table of validation
loss and retrieval R@1 trajectories plus a final-epoch delta summary.

Usage: python tools/ab_compare.py [--ref DIR] [--tpu DIR]
"""
from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

RETRIEVAL_FIELDS = [
    ("val_base/loss", "vloss", 3),
    ("val_base/vid2par-r1", "v2p@1", 3),
    ("val_base/par2vid-r1", "p2v@1", 3),
    ("val_base/cli2sen-r1", "c2s@1", 3),
    ("val_base/sen2cli-r1", "s2c@1", 3),
]
CAPTION_FIELDS = [
    ("val_base/loss", "vloss", 3),
    ("train/acc", "tacc", 3),
    ("cap/b4", "b4", 3),
    ("cap/rogl", "rougeL", 3),
    ("cap/re4", "re4", 3),
]
FIELDS = RETRIEVAL_FIELDS


def load_run(run_dir: Path):
    out = {}
    for f in sorted((run_dir / "metrics").glob("metrics_epoch_*.json")):
        ep = int(re.search(r"_(\d+)\.json$", f.name).group(1))
        d = json.loads(f.read_text())
        vals = {}
        for key, name, _ in FIELDS:
            v = d.get(key)
            if isinstance(v, list):
                v = v[-1][1] if v and isinstance(v[-1], list) else v[-1]
            vals[name] = v
        out[ep] = vals
    return dict(sorted(out.items()))


def find_runs(base: Path):
    # experiment trees (<task>/<group>/<run>) or flat evidence dirs
    cands = list(base.glob("*/*/*")) + list(base.glob("*"))
    return {p.name: p for p in sorted(cands)
            if (p / "metrics").is_dir()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="experiments_ref_ab")
    ap.add_argument("--tpu", default="experiments_tpu_ab")
    ap.add_argument("--task", default="retrieval",
                    choices=["retrieval", "caption"])
    args = ap.parse_args()

    global FIELDS
    FIELDS = (CAPTION_FIELDS if args.task == "caption"
              else RETRIEVAL_FIELDS)

    repo = Path(__file__).resolve().parent.parent
    ref_runs = {n: r for n, p in find_runs(repo / args.ref).items()
                if "probe" not in n and (r := load_run(p))}
    tpu_runs = {n: r for n, p in find_runs(repo / args.tpu).items()
                if "probe" not in n and (r := load_run(p))}

    names = [n for _, n, _ in FIELDS]
    for side, runs in (("reference(torch)", ref_runs), ("tpu", tpu_runs)):
        for rname, eps in runs.items():
            print(f"\n== {side} {rname} ==")
            print("ep   " + "  ".join(f"{n:>7}" for n in names))
            for ep, vals in eps.items():
                cells = [
                    f"{vals[n]:7.3f}" if vals[n] is not None else "      -"
                    for n in names]
                print(f"{ep:<4d} " + "  ".join(cells))

    # final-epoch deltas, averaged over runs per side
    def final_avg(runs):
        acc = {n: [] for n in names}
        for eps in runs.values():
            last = eps[max(eps)]
            for n in names:
                if last[n] is not None:
                    acc[n].append(last[n])
        return {n: (sum(v) / len(v) if v else None) for n, v in acc.items()}

    if ref_runs and tpu_runs:
        fr, ft = final_avg(ref_runs), final_avg(tpu_runs)
        print("\n== final-epoch means (ref | tpu | delta) ==")
        for n in names:
            if fr[n] is None or ft[n] is None:
                continue
            print(f"{n:>6}: {fr[n]:7.3f} | {ft[n]:7.3f} | "
                  f"{ft[n] - fr[n]:+7.3f}")


if __name__ == "__main__":
    main()
