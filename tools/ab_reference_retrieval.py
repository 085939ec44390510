"""Run the REFERENCE implementation (torch, /root/reference, read-only)
on the yc2like A/B config for the quality-parity comparison in PARITY.md.

Drives the reference's own train_retrieval.py CLI via runpy with minimal
python-3.12 import shims (collections ABCs, GPUtil/pathspec stubs —
identical to tests/test_torch_convert.py). No reference code is modified;
experiments are written under --log_dir in THIS repo.

Usage:
    python data_gen_yc2like.py   # materialize data/yc2like first
    python tools/ab_reference_retrieval.py [--run NAME] [--epochs N]
"""
from __future__ import annotations

import argparse
import collections
import collections.abc
import os
import runpy
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def install_shims() -> None:
    for n in ("Iterable", "Mapping", "Sequence", "Callable",
              "MutableMapping"):
        setattr(collections, n, getattr(collections.abc, n))
    for fake in ("GPUtil", "pathspec"):
        if fake not in sys.modules:
            sys.modules[fake] = types.ModuleType(fake)
    if not hasattr(sys.modules["pathspec"], "PathSpec"):
        sys.modules["pathspec"].PathSpec = type("PathSpec", (), {})
    # the reference's per-N-steps profiling calls GPUtil.getGPUs()
    # (nntrainer/utils_torch.py:164); zero GPUs is handled fine there
    if not hasattr(sys.modules["GPUtil"], "getGPUs"):
        sys.modules["GPUtil"].getGPUs = lambda: []
    sys.path.insert(0, REF)

    # the reference's own train_retrieval.py:50 calls
    # set_seed(..., set_deterministic=False) but utils_torch.py:54 has no
    # such kwarg (crashes whenever a seed is set) — adapt the signature
    import nntrainer.utils_torch as ut

    orig_set_seed = ut.set_seed

    def set_seed(seed, set_deterministic=None, cudnn_deterministic=False,
                 cudnn_benchmark=True):
        if set_deterministic is not None:
            cudnn_deterministic = set_deterministic
        return orig_set_seed(seed, cudnn_deterministic=cudnn_deterministic,
                             cudnn_benchmark=cudnn_benchmark)

    ut.set_seed = set_seed

    # torch>=2.6 defaults torch.load(weights_only=True), which rejects
    # the reference's own checkpoints (they pickle
    # nntrainer.lr_scheduler.SchedulerConfig inside the optimizer state,
    # trainer_base.py:672). These are checkpoints this runner itself
    # wrote — trusted — so restore the old default for --resume.
    import torch

    orig_load = torch.load

    def load(*a, **kw):
        kw.setdefault("weights_only", False)
        return orig_load(*a, **kw)

    torch.load = load


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="ref1", help="run name suffix")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override train.num_epochs")
    ap.add_argument("--seed", default="0")
    ap.add_argument("--config", default="config/retrieval/ab/yc2like_ab.yaml",
                    help="A/B yaml (repo-relative), e.g. the "
                         "reference-scale config/retrieval/ab/yc2big_ab.yaml")
    ap.add_argument("--resume", action="store_true",
                    help="drop --reset so the reference trainer auto-"
                         "resumes from the run's last checkpoint (long "
                         "reference-scale runs span driver rounds)")
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
    ]
    if not args.resume:
        argv.append("--reset")
    if args.epochs is not None:
        argv += ["-o", f"train.num_epochs={args.epochs}"]
    sys.argv = argv
    register_bench_competitor()
    runpy.run_path(os.path.join(REF, "train_retrieval.py"),
                   run_name="__main__")


def register_bench_competitor() -> None:
    """Record this PID so bench.py can SIGSTOP us for its timed run.

    Reference-scale runs hold the host's single CPU core for hours;
    bench.py pauses registered competitors (verifying the tag against
    /proc/<pid>/cmdline first) and SIGCONTs them when it finishes, so
    the driver's end-of-round bench isn't starved of host CPU. Stale
    lines are harmless — dead/recycled PIDs fail the tag check.
    """
    pidfile = os.path.join(REPO, ".bench_competitors.pid")
    line = f"{os.getpid()} ab_reference_retrieval.py\n"
    with open(pidfile, "a", encoding="utf8") as f:
        f.write(line)


if __name__ == "__main__":
    main()
