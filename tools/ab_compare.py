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
    ("val_base/best_field", "best", 3),
]
# retrieval R@1 columns scored against the quality bar (fractions; the
# bar is 0.5 percentage points, BASELINE.md)
R1_FIELDS = ("v2p@1", "p2v@1", "c2s@1", "s2c@1")
CAPTION_FIELDS = [
    ("val_base/loss", "vloss", 3),
    ("train/acc", "tacc", 3),
    ("cap/b4", "b4", 3),
    ("cap/met", "met", 3),
    ("cap/rol", "rougeL", 3),
    ("cap/cid", "cider", 3),
    ("cap/re4", "re4", 3),
    ("val_base/best_field", "best", 3),
]
# caption columns scored in the verdict; all on a 0-1 scale except
# CIDEr (0-10), which gets its own floor below
CAP_VERDICT_FIELDS = ("b4", "met", "rougeL", "cider")
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
        # overlay metrics re-scored through the single shared scorer
        # path (tools/ab_rescore_captions.py) over live-logged values --
        # this is what makes cap/met comparable when one side's trainer
        # hit the reference's -999 no-java METEOR path
        rescored = run_dir / "metrics" / f"rescored_epoch_{ep}.json"
        if rescored.is_file():
            r = json.loads(rescored.read_text())
            for key, name, _ in FIELDS:
                if key in r:
                    vals[name] = r[key]
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
    ap.add_argument("--json", default=None,
                    help="also write the summary (incl. per-run "
                         "trajectories) to this path")
    ap.add_argument("--match", default="",
                    help="only include runs whose name contains this "
                         "substring (e.g. yc2big_ab)")
    ap.add_argument("--best-mode", default="max", choices=["max", "min"],
                    help="the trainer config's det_best_compare_mode for "
                         "these runs; 'min' (e.g. best field val_loss) "
                         "makes best-epoch selection take the minimum")
    args = ap.parse_args()

    global FIELDS
    FIELDS = (CAPTION_FIELDS if args.task == "caption"
              else RETRIEVAL_FIELDS)

    repo = Path(__file__).resolve().parent.parent
    ref_runs = {n: r for n, p in find_runs(repo / args.ref).items()
                if "probe" not in n and args.match in n
                and (r := load_run(p))}
    tpu_runs = {n: r for n, p in find_runs(repo / args.tpu).items()
                if "probe" not in n and args.match in n
                and (r := load_run(p))}

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
                # skip the reference's crashed-scorer sentinel (-999)
                if last[n] is not None and last[n] > -998:
                    acc[n].append(last[n])
        return {n: (sum(v) / len(v) if v else None) for n, v in acc.items()}

    # best-epoch values per run (reference README numbers are best-epoch).
    # Reproduces the trainer's own best tracking EXACTLY (reference
    # nntrainer/trainer_base.py:644-670): walking epochs in order, a new
    # epoch only becomes best when it beats the incumbent by the
    # RELATIVE threshold (det_best_threshold_mode rel, value 1e-4 in
    # every config this tool compares) -- in particular an exact tie
    # keeps the EARLIER epoch, which matters because the quantized R@1
    # mean really does tie across epochs (refbigs1x1 ep10==ep11).
    # --best-mode must match the config's det_best_compare_mode.
    def best_ep(eps):
        rel = 1e-4
        best_v = best_e = None
        for ep in sorted(eps):
            v = eps[ep].get("best")
            if v is None:
                continue
            if (best_v is None
                    or (args.best_mode == "max" and v > best_v * (1 + rel))
                    or (args.best_mode == "min" and v < best_v * (1 - rel))):
                best_v, best_e = v, ep
        return best_e if best_e is not None else max(eps)

    def best_avg(runs):
        acc = {n: [] for n in names}
        for eps in runs.values():
            at = eps[best_ep(eps)]
            for n in names:
                if at[n] is not None and at[n] > -998:
                    acc[n].append(at[n])
        return {n: (sum(v) / len(v) if v else None) for n, v in acc.items()}

    summary = {}
    if ref_runs and tpu_runs:
        for label, avg in (("final-epoch", final_avg),
                           ("best-epoch", best_avg)):
            fr, ft = avg(ref_runs), avg(tpu_runs)
            print(f"\n== {label} means (ref | tpu | delta) ==")
            deltas = {}
            for n in names:
                if fr[n] is None or ft[n] is None:
                    continue
                deltas[n] = ft[n] - fr[n]
                print(f"{n:>6}: {fr[n]:7.3f} | {ft[n]:7.3f} | "
                      f"{deltas[n]:+7.3f}")
            summary[label] = {"ref": fr, "tpu": ft, "delta": deltas}
        if args.task == "retrieval":
            # the bar is "matches or beats": score the worst DEFICIT
            # (tpu below ref) across R@1 metrics at the BEST epoch —
            # the reference's own reporting convention (its README
            # table and show_retrieval.py read best-epoch metrics).
            # The final-epoch row above is supplementary: single-epoch
            # snapshots of these metrics fluctuate ~±0.5 pts between
            # adjacent epochs within one run.
            deficits = [
                -summary["best-epoch"]["delta"][n]
                for n in R1_FIELDS
                if n in summary["best-epoch"]["delta"]]
            # noise floor: the reference's own seed-to-seed spread
            def spread(runs, conv_best):
                vals = {n: [] for n in R1_FIELDS}
                for eps in runs.values():
                    at = eps[best_ep(eps) if conv_best else max(eps)]
                    for n in R1_FIELDS:
                        if at[n] is not None:
                            vals[n].append(at[n])
                return {n: (max(v) - min(v) if len(v) > 1 else 0.0)
                        for n, v in vals.items()}
            ref_spread = spread(ref_runs, True)
            if deficits:
                worst = max(deficits)
                # per-metric bar = max(0.5 pts, the reference's own
                # same-side seed spread): a deficit inside the spread of
                # the reference's OWN seeds is indistinguishable from
                # seed noise (yc2big measured spreads: v2p/p2v several
                # pts, c2s/s2c ~0.1-0.3 pts -- the low-variance
                # clip-sentence metrics are the discriminative signal
                # and still face the strict 0.5-pt bar). Same
                # convention as the caption verdict below.
                worst_margin, rows = None, []
                for n in R1_FIELDS:
                    if n not in summary["best-epoch"]["delta"]:
                        continue
                    deficit = -summary["best-epoch"]["delta"][n]
                    bar = max(0.005, ref_spread[n])
                    rows.append((n, deficit, bar))
                    margin = bar - deficit
                    if worst_margin is None or margin < worst_margin:
                        worst_margin = margin
                verdict = "PASS" if worst_margin >= 0 else "FAIL"
                print(f"\nworst best-epoch R@1 deficit: "
                      f"{worst * 100:.2f} pts; per-metric deficits vs "
                      f"bar -> {verdict}")
                for n, deficit, bar in rows:
                    print(f"  {n:>6}: deficit {deficit * 100:+6.2f} pts"
                          f"  bar {bar * 100:.2f} pts")
                print("(bar = max(0.5 pts, reference same-side seed "
                      "spread); spreads: "
                      + ", ".join(f"{n} {ref_spread[n] * 100:.1f}"
                                  for n in R1_FIELDS) + ")")
                summary["worst_r1_deficit_pts"] = worst * 100
                summary["r1_deficits_pts"] = {
                    n: d * 100 for n, d, _ in rows}
                summary["r1_bars_pts"] = {n: b * 100 for n, _, b in rows}
                summary["verdict_spread_aware"] = verdict
                summary["verdict_0p5pt"] = (
                    "PASS" if worst * 100 <= 0.5 else "FAIL")
                summary["ref_seed_spread_pts"] = {
                    n: ref_spread[n] * 100 for n in R1_FIELDS}
        elif args.task == "caption":
            # caption quality bar: TPU best-epoch means must be within
            # max(floor, reference same-side seed spread) of the
            # reference means on every language metric. Floors: 0.5 pts
            # for the 0-1 metrics (B4/METEOR/ROUGE-L), 2 pts for CIDEr
            # (0-10 scale; its per-seed variance on this set is larger).
            floors = {"b4": 0.005, "met": 0.005, "rougeL": 0.005,
                      "cider": 0.02}

            def spread(runs):
                vals = {n: [] for n in CAP_VERDICT_FIELDS}
                for eps in runs.values():
                    at = eps[best_ep(eps)]
                    for n in CAP_VERDICT_FIELDS:
                        if at.get(n) is not None:
                            vals[n].append(at[n])
                return {n: (max(v) - min(v) if len(v) > 1 else 0.0)
                        for n, v in vals.items()}
            ref_spread = spread(ref_runs)
            delta = summary["best-epoch"]["delta"]
            rows, worst_margin = [], None
            for n in CAP_VERDICT_FIELDS:
                if n not in delta:
                    continue
                bar = max(floors[n], ref_spread[n])
                margin = bar - (-delta[n])  # >0: deficit inside the bar
                rows.append((n, -delta[n], bar))
                if worst_margin is None or margin < worst_margin:
                    worst_margin = margin
            if rows:
                verdict = "PASS" if worst_margin >= 0 else "FAIL"
                print(f"\ncaption best-epoch deficits (tpu below ref) "
                      f"vs bar -> {verdict}")
                for n, deficit, bar in rows:
                    print(f"  {n:>6}: deficit {deficit * 100:+6.2f} pts"
                          f"  bar {bar * 100:.2f} pts")
                print("(bar = max(floor, reference same-side seed "
                      "spread); floors 0.5 pts, CIDEr 2 pts)")
                summary["caption_deficits_pts"] = {
                    n: d * 100 for n, d, _ in rows}
                summary["caption_bars_pts"] = {
                    n: b * 100 for n, _, b in rows}
                summary["ref_seed_spread_pts"] = {
                    n: ref_spread[n] * 100 for n in CAP_VERDICT_FIELDS}
                summary["verdict_caption"] = verdict
        if args.json:
            summary["runs"] = {"ref": {n: r for n, r in ref_runs.items()},
                               "tpu": {n: r for n, r in tpu_runs.items()}}
            Path(args.json).write_text(json.dumps(summary, indent=1),
                                       encoding="utf8")
            print(f"summary written to {args.json}")


if __name__ == "__main__":
    main()
