"""
Round-5 A/B tooling: the caption re-scorer (single shared scorer path)
and ab_compare's trainer-exact best-epoch selection / rescored overlay.
These drive the verdict tables in PARITY.md, so they get their own
fixtures-level coverage.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _write_run(root: Path, name: str, best_series, met_series,
               translations_ep=None):
    """Minimal experiment dir: metrics_epoch_N.json trajectory (+ an
    optional translations json for the re-scorer)."""
    run = root / "caption" / "default" / name
    (run / "metrics").mkdir(parents=True)
    (run / "caption").mkdir()
    eps = list(range(len(best_series)))
    for upto in eps:  # one trajectory file per epoch, like the trainer
        sub = eps[:upto + 1]
        payload = {
            "val_base/best_field": [[e, best_series[e]] for e in sub],
            "val_base/loss": [[e, 2.0] for e in sub],
            "train/acc": [[e, 0.5] for e in sub],
            "cap/b4": [[e, 0.1] for e in sub],
            "cap/met": [[e, met_series[e]] for e in sub],
            "cap/rol": [[e, 0.3] for e in sub],
            "cap/cid": [[e, best_series[e]] for e in sub],
            "cap/re4": [[e, 0.001] for e in sub],
        }
        (run / "metrics" / f"metrics_epoch_{upto}.json").write_text(
            json.dumps(payload))
    if translations_ep is not None:
        results = {
            "v_0000000000m": [
                {"sentence": "pour the oil into the pan",
                 "timestamp": [0, 1], "gt_sentence": "x"}],
        }
        (run / "caption" /
         f"translations_{translations_ep}_val.json").write_text(
            json.dumps({"version": "VERSION 1.0", "results": results,
                        "external_data": {}}))
    return run


def test_rescore_run_writes_shared_path_metrics(tmp_path):
    from tools.ab_rescore_captions import rescore_run

    root = tmp_path / "experiments_x"
    run = _write_run(root, "demo_run", [0.5, 1.0], [-999, -999],
                     translations_ep=1)
    # paragraph GT format: {video_key: "sent. sent."} (same shape as
    # annotations/youcook2/captioning_val_para.json)
    gt = tmp_path / "gt.json"
    gt.write_text(json.dumps(
        {"v_0000000000m": "pour the oil into the pan."}))
    n = rescore_run(run, gt)
    assert n == 1
    row = json.loads(
        (run / "metrics" / "rescored_epoch_1.json").read_text())
    # perfect hypothesis == reference: BLEU-4 and METEOR-lite near 1
    assert row["cap/b4"] > 0.99
    assert row["cap/met"] > 0.9
    assert set(row) == {"cap/b1", "cap/b2", "cap/b3", "cap/b4",
                        "cap/met", "cap/rol", "cap/cid"}


def test_ab_compare_trainer_exact_best_and_overlay(tmp_path):
    """End-to-end over a synthetic pair of run trees: (a) an exact
    best-field tie keeps the EARLIER epoch (trainer rel-threshold rule,
    reference nntrainer/trainer_base.py:644-670); (b) rescored files
    overlay the live -999 METEOR; (c) the caption verdict block runs."""
    ref_root = tmp_path / "ref_ab"
    tpu_root = tmp_path / "tpu_ab"
    # ref run: best field TIES at epochs 1 and 2 -> best epoch must be 1
    ref = _write_run(ref_root, "capfix_ref1", [0.5, 1.0, 1.0],
                     [-999, -999, -999])
    (ref / "metrics" / "rescored_epoch_1.json").write_text(
        json.dumps({"cap/met": 0.35, "cap/b4": 0.10}))
    tpu = _write_run(tpu_root, "capfix_tpu1", [0.5, 1.0, 0.9],
                     [0.36, 0.36, 0.36])
    (tpu / "metrics" / "rescored_epoch_1.json").write_text(
        json.dumps({"cap/met": 0.36, "cap/b4": 0.10}))

    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "ab_compare.py"),
         "--task", "caption", "--match", "capfix",
         "--ref", str(ref_root), "--tpu", str(tpu_root),
         "--json", str(tmp_path / "s.json")],
        capture_output=True, text=True, cwd=REPO, timeout=240)
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads((tmp_path / "s.json").read_text())
    # overlay: ref best-epoch met is the rescored 0.35, not -999
    assert np.isclose(summary["best-epoch"]["ref"]["met"], 0.35)
    assert np.isclose(summary["best-epoch"]["tpu"]["met"], 0.36)
    assert summary["verdict_caption"] == "PASS"
    # tie at epochs 1/2 resolved to the earlier epoch: the run tables
    # printed epoch-1 values for the ref side (met 0.350 from overlay)
    assert "PASS" in out.stdout
