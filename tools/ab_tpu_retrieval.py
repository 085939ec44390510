"""Run THIS framework's side of the retrieval quality A/B (the twin of
tools/ab_reference_retrieval.py) with the long-run safety rails:

  - registers its PID in .bench_competitors.pid so the driver's
    end-of-round bench.py SIGSTOPs it for the timed window instead of
    contending for the single host core (or, worse, the TPU chip);
  - --resume drops --reset so BaseTrainer auto-resumes from the run's
    newest checkpoint (reference-scale runs span driver rounds);
  - uncaught exceptions land in the experiment's logs/run_*.log via
    train_retrieval.py's guard, so a detached run that dies is
    diagnosable from the experiment dir alone.

Usage:
    python data_gen_yc2big.py     # materialize data/yc2big first
    python tools/ab_tpu_retrieval.py --run tpubigs --seed 0 \
        --config config/retrieval/ab/yc2big_ab.yaml [--resume]

Writes experiments under experiments_tpu_ab/ in the layout
tools/ab_compare.py expects. --fixed_shapes is always on: it is the
ours-only performance flag (device store + one XLA compile) and does
not change the math the A/B compares.
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def register_bench_competitor() -> None:
    """Record this PID so bench.py can SIGSTOP us for its timed run.

    Same contract as tools/ab_reference_retrieval.py: bench.py verifies
    the tag against /proc/<pid>/cmdline before signalling, so stale
    lines from dead or recycled PIDs are harmless.
    """
    pidfile = os.path.join(REPO, ".bench_competitors.pid")
    line = f"{os.getpid()} ab_tpu_retrieval.py\n"
    with open(pidfile, "a", encoding="utf8") as f:
        f.write(line)


def _experiment_dir(config_path: str, run: str) -> str:
    """Experiment dir for run `<run>1` of the given A/B yaml (the CLI's
    run-number suffix is always 1 here: single-run invocations)."""
    exp_name = os.path.splitext(os.path.basename(config_path))[0]
    return os.path.join(REPO, "experiments_tpu_ab", "retrieval", "default",
                        f"{exp_name}_{run}1")


def _done_epochs(exp_dir: str):
    """Epoch numbers with a saved trainerstate (the trainer writes it
    after every completed epoch)."""
    import glob
    import re
    eps = []
    for f in glob.glob(os.path.join(exp_dir, "models",
                                    "trainerstate_*.json")):
        m = re.search(r"trainerstate_(\d+)\.json$", f)
        if m:
            eps.append(int(m.group(1)))
    return sorted(eps)


def run_chunked(args) -> None:
    """One epoch per child process (see --chunked help)."""
    import subprocess

    import yaml
    with open(os.path.join(REPO, args.config), encoding="utf8") as fh:
        target = int(yaml.safe_load(fh)["train"]["num_epochs"])
    if args.epochs is not None:
        target = args.epochs
    exp_dir = _experiment_dir(args.config, args.run)

    stalls = 0
    while True:
        done = _done_epochs(exp_dir)
        if done and done[-1] >= target - 1:
            print(f"[chunked] all {target} epochs done ({exp_dir})")
            return
        nxt = (done[-1] + 1) if done else 0
        # always --resume: with no checkpoints the trainer starts fresh
        # without clobbering earlier epochs' logs/metrics
        upto = min(nxt + args.epochs_per_chunk, target)
        cmd = [sys.executable, os.path.abspath(__file__),
               "--run", args.run, "--seed", args.seed,
               "--config", args.config, "--preload", "--resume",
               "--epochs", str(upto)]
        for ov in args.config_override:
            cmd += ["-o", ov]
        print(f"[chunked] epochs {nxt}..{upto - 1}/{target - 1}: "
              f"{' '.join(cmd[1:])}", flush=True)
        rc = subprocess.call(cmd)
        new = _done_epochs(exp_dir)
        if rc != 0 and new == done:
            print(f"[chunked] child rc={rc} with no new checkpoint; "
                  "aborting (see the experiment's logs/run_*.log)",
                  flush=True)
            sys.exit(rc)
        # a clean child exit that advanced no epoch (e.g. the trainer
        # deciding it is already done, or checkpointing misconfigured)
        # would otherwise relaunch identical children forever
        if new == done:
            stalls += 1
            if stalls >= 3:
                print(f"[chunked] {stalls} consecutive children made no "
                      f"epoch progress (stuck at {done}); aborting",
                      flush=True)
                sys.exit(1)
        else:
            stalls = 0
        # checkpoint advanced after rc!=0: the failure was post-save
        # (e.g. a teardown crash); keep going


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="tpu1", help="run name suffix")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override train.num_epochs")
    ap.add_argument("--seed", default="0")
    ap.add_argument("--config", default="config/retrieval/ab/yc2like_ab.yaml",
                    help="A/B yaml (repo-relative), e.g. the reference-"
                         "scale config/retrieval/ab/yc2big_ab.yaml")
    ap.add_argument("--resume", action="store_true",
                    help="drop --reset so the trainer auto-resumes from "
                         "the run's newest checkpoint")
    ap.add_argument("--epochs_per_chunk", type=int, default=3,
                    help="epochs per child process in --chunked mode. "
                         "With packed transfers (~0.4 GB/step leaked "
                         "instead of ~1.7 GB) several epochs fit one "
                         "process's RAM budget; the persistent XLA "
                         "compile cache makes restarts cheap either way.")
    ap.add_argument("--preload", action="store_true",
                    help="preload features into host RAM. Essential at "
                         "reference scale when the f32 store misses the "
                         "HBM auto-budget: per-step lazy h5 reads are "
                         "~335 MB/step and starve the single-core host "
                         "(the round-3 silent stall).")
    ap.add_argument("--preload_device", action="store_true",
                    help="force the HBM feature store (index-only steps)."
                         " The ONLY long-run-safe pipeline on this "
                         "environment: every bulk host->device transfer "
                         "leaks its size in host RAM (axon client bug; "
                         "measured 84 MB/84 MB-put), so per-step dense "
                         "batches OOM the host after ~65 dispatches.")
    ap.add_argument("-o", "--config_override", action="append", default=[],
                    help="forwarded config overrides (key=value)")
    ap.add_argument("--chunked", action="store_true",
                    help="train ONE epoch per child process, restarting "
                         "until the config's num_epochs are done. This is "
                         "the long-run-safe mode on this environment: the "
                         "axon client leaks every bulk host->device "
                         "transfer (~1.7 GB per dense f32 step at "
                         "reference scale), so a single process is OOM-"
                         "killed after ~2 epochs; one epoch per process "
                         "peaks at ~60 GB host RSS and exits. Implies "
                         "--preload (the HBM store does not fit: 10.9 GB "
                         "f32 features + step activations > 16 GB v5e).")
    args = ap.parse_args()

    if args.chunked:
        return run_chunked(args)

    os.chdir(REPO)
    argv = [
        "train_retrieval.py",
        "-c", os.path.join(REPO, args.config),
        "--data_path", os.path.join(REPO, "data"),
        "--log_dir", "experiments_tpu_ab",
        "--workers", "0", "--seed", args.seed,
        "--run_name", args.run,
        "--fixed_shapes",
    ]
    if not args.resume:
        argv.append("--reset")
    if args.preload:
        argv.append("--preload")
    if args.preload_device:
        argv.append("--preload_device")
    if args.epochs is not None:
        argv += ["-o", f"train.num_epochs={args.epochs}"]
    for ov in args.config_override:
        argv += ["-o", ov]
    sys.argv = argv
    register_bench_competitor()

    sys.path.insert(0, REPO)
    import train_retrieval
    train_retrieval.main()


if __name__ == "__main__":
    main()
