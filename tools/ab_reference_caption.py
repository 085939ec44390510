"""Run the REFERENCE implementation's caption training (torch, CPU) on
the seeded synthetic caption dataset for the caption-task quality A/B
(PARITY.md). Train-only (the A/B config disables validation), so the
comparison is the seeded loss/token-accuracy trajectory.

Shims (no reference code modified):
- the usual py3.12 import shims (collections ABCs, GPUtil, pathspec);
- nltk punkt data is absent in this image — nltk.tokenize.word_tokenize
  is pointed at the TreebankWordTokenizer (identical output on single
  sentences, the same fallback our dataset uses);
- pycocoevalcap is not installed — mart.trainer_caption imports it at
  module level even when validation never runs, so an import-only stub
  is installed (its classes raise if ever constructed).

Usage: python data-gen via generate_caption_dataset (data/capsynth_ab),
then: python tools/ab_reference_caption.py [--run NAME] [--epochs N]
"""
from __future__ import annotations

import argparse
import os
import runpy
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def install_shims() -> None:
    import collections
    import collections.abc
    for n in ("Iterable", "Mapping", "Sequence", "Callable",
              "MutableMapping"):
        setattr(collections, n, getattr(collections.abc, n))
    for fake in ("GPUtil", "pathspec"):
        if fake not in sys.modules:
            sys.modules[fake] = types.ModuleType(fake)
    if not hasattr(sys.modules["GPUtil"], "getGPUs"):
        sys.modules["GPUtil"].getGPUs = lambda: []
    if not hasattr(sys.modules["pathspec"], "PathSpec"):
        sys.modules["pathspec"].PathSpec = type("PathSpec", (), {})
    sys.path.insert(0, REF)

    # nltk punkt-free tokenization (identical on single sentences)
    import nltk
    from nltk.tokenize import TreebankWordTokenizer
    tok = TreebankWordTokenizer()
    nltk.tokenize.word_tokenize = lambda s: tok.tokenize(s)

    # pycocoevalcap is not installed: provide a FUNCTIONAL stub backed by
    # this repo's hermetic scorers (golden-tested against pycocoevalcap
    # semantics), so the reference's language evaluation runs and both
    # A/B sides are scored by the identical implementation. Meteor
    # raises at construction -> the reference's own -999 path (matching
    # our java-less environment); PTBTokenizer is constructed but never
    # called by the reference evaluator.
    sys.path.insert(0, REPO)
    from coot_videotext_tpu.tasks.caption.metrics.bleu import (
        BleuScorer as _HermeticBleuScorer)
    from coot_videotext_tpu.tasks.caption.metrics.cider import Cider
    from coot_videotext_tpu.tasks.caption.metrics.rouge import Rouge

    class BleuScorer:
        def __init__(self, n=4):
            self._hb = _HermeticBleuScorer(n)

        def __iadd__(self, pair):
            hypo, refs = pair
            self._hb.append(hypo, refs)
            return self

        def compute_score(self, option="closest", verbose=0):
            return self._hb.compute_score()

    # Score METEOR with the same hermetic METEOR-lite the TPU side logs,
    # so cap/met is comparable across the A/B (round-4 verdict: the ref
    # side fell into its -999 no-java path while ours logged METEOR-lite,
    # making the one METEOR column in the chained A/B incomparable).
    # MeteorLite already speaks the pycocoevalcap driver interface
    # (compute_score(gts, res) -> (score, scores)).
    from coot_videotext_tpu.tasks.caption.metrics.meteor_lite import (
        MeteorLite)

    class Meteor(MeteorLite):
        def __init__(self):
            print("[ab shim] scoring METEOR with hermetic METEOR-lite "
                  "(same path as the TPU side)")

    class PTBTokenizer:
        pass

    root = types.ModuleType("pycocoevalcap")
    for sub, classes in (("bleu.bleu", {"BleuScorer": BleuScorer}),
                         ("cider.cider", {"Cider": Cider}),
                         ("meteor.meteor", {"Meteor": Meteor}),
                         ("rouge.rouge", {"Rouge": Rouge}),
                         ("tokenizer.ptbtokenizer",
                          {"PTBTokenizer": PTBTokenizer})):
        parts = sub.split(".")
        parent = root
        full = "pycocoevalcap"
        for p in parts:
            full = f"{full}.{p}"
            mod = sys.modules.get(full) or types.ModuleType(full)
            sys.modules[full] = mod
            setattr(parent, p, mod)
            parent = mod
        for name, cls in classes.items():
            setattr(parent, name, cls)
    sys.modules["pycocoevalcap"] = root

    # torch>=2.6 defaults torch.load(weights_only=True), which rejects
    # the reference's own checkpoints (pickled config objects inside the
    # saved dict). These are checkpoints this runner itself wrote —
    # trusted — so restore the old default for --resume/EMA reload.
    import torch

    orig_load = torch.load

    def load(*a, **kw):
        kw.setdefault("weights_only", False)
        return orig_load(*a, **kw)

    torch.load = load

    # mart/trainer_caption.py:102-103 declares pydantic fields without
    # annotations (`prev_best_score = 0.`), which pydantic v2 rejects at
    # class creation — exec a source-patched copy of the module under its
    # name (the reference file itself stays untouched)
    import mart  # noqa: F401  (package init)
    src_path = os.path.join(REF, "mart", "trainer_caption.py")
    with open(src_path, encoding="utf8") as fh:
        src = fh.read()
    src = src.replace("    prev_best_score = 0.\n    es_cnt = 0",
                      "    prev_best_score: float = 0.\n"
                      "    es_cnt: int = 0")
    mod = types.ModuleType("mart.trainer_caption")
    mod.__file__ = src_path
    mod.__package__ = "mart"
    sys.modules["mart.trainer_caption"] = mod
    exec(compile(src, src_path, "exec"), mod.__dict__)


def register_bench_competitor() -> None:
    """Record this PID so bench.py can SIGSTOP us for its timed run
    (same contract as tools/ab_reference_retrieval.py)."""
    pidfile = os.path.join(REPO, ".bench_competitors.pid")
    with open(pidfile, "a", encoding="utf8") as f:
        f.write(f"{os.getpid()} ab_reference_caption.py\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="refcap0", help="run name suffix")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--seed", default="0")
    ap.add_argument("--config", default="config/caption/ab/capsynth_ab.yaml",
                    help="A/B yaml (repo-relative), e.g. the chained "
                         "config/caption/ab/yc2big_mart_ab.yaml")
    ap.add_argument("--annotations_dir",
                    default="data/capsynth_ab/annotations")
    ap.add_argument("--coot_feat_dir",
                    default="data/capsynth_ab/provided_embeddings",
                    help="per-side COOT embedding dir (the chained A/B "
                         "points this at the embeddings exported by the "
                         "REFERENCE's own retrieval run)")
    ap.add_argument("--resume", action="store_true",
                    help="drop --reset so the reference trainer auto-"
                         "resumes from the run's last checkpoint")
    args = ap.parse_args()

    install_shims()
    os.chdir(REPO)
    argv = [
        "train_caption.py",
        "-c", os.path.join(REPO, args.config),
        "--annotations_dir", os.path.join(REPO, args.annotations_dir),
        "--coot_feat_dir", os.path.join(REPO, args.coot_feat_dir),
        "--log_dir", os.path.join(REPO, "experiments_ref_ab"),
        "--workers", "0", "--seed", args.seed,
        "--run_name", args.run,
    ]
    if not args.resume:
        argv.append("--reset")
    if args.epochs is not None:
        argv += ["-o", f"train.num_epochs={args.epochs}"]
    sys.argv = argv
    register_bench_competitor()
    runpy.run_path(os.path.join(REF, "train_caption.py"),
                   run_name="__main__")


if __name__ == "__main__":
    main()
