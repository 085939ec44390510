"""
Golden-value scheduler tests: the exact LR sequences from the reference's own
tests (tests_nntrainer/test_scheduling.py:84-148) must reproduce.
"""

from typing import List, Optional

import numpy as np

from coot_videotext_tpu.config.base import (
    SchedulerConfig, SchedulerConst, SchedulerWarmupConst)
from coot_videotext_tpu.train.schedule import make_lr_scheduler


def _run_scheduler(scheduler, num_epochs: int, steps_per_epoch: int,
                   epoch_is_val: Optional[List[bool]] = None,
                   epoch_has_improved: Optional[List[bool]] = None
                   ) -> List[float]:
    save_lrs = [scheduler.current_lr]
    for ep in range(num_epochs):
        for _ in range(steps_per_epoch):
            scheduler.step()
            save_lrs.append(scheduler.current_lr)
        is_val = False if epoch_is_val is None else epoch_is_val[ep]
        improved = (False if epoch_has_improved is None
                    else epoch_has_improved[ep])
        scheduler.step_epoch(is_val, improved)
    return save_lrs


def test_const_step_warmup():
    cfg = SchedulerConfig({"name": SchedulerConst.NONE,
                           "warmup_type": SchedulerWarmupConst.STEP,
                           "warmup_epochs": 5})
    sched = make_lr_scheduler(cfg, 1e-3, 8, 3)
    lrs = _run_scheduler(sched, 8, 3)
    expected = [
        6.25e-05, 0.000125, 0.0001875, 0.00025, 0.0003125, 0.000375,
        0.0004375, 0.0005, 0.0005625000000000001, 0.000625, 0.0006875,
        0.00075, 0.0008125000000000001, 0.000875, 0.0009375, 0.001, 0.001,
        0.001, 0.001, 0.001, 0.001, 0.001, 0.001, 0.001, 0.001]
    assert np.allclose(lrs, expected)


def test_const_epoch_warmup():
    cfg = SchedulerConfig({"name": SchedulerConst.NONE,
                           "warmup_type": SchedulerWarmupConst.EPOCH,
                           "warmup_epochs": 5})
    sched = make_lr_scheduler(cfg, 1e-3, 8, 3)
    lrs = _run_scheduler(sched, 8, 3)
    expected = [
        0.0002, 0.0002, 0.0002, 0.0002, 0.0004, 0.0004, 0.0004, 0.0006,
        0.0006, 0.0006, 0.0008, 0.0008, 0.0008, 0.001, 0.001, 0.001, 0.001,
        0.001, 0.001, 0.001, 0.001, 0.001, 0.001, 0.001, 0.001]
    assert np.allclose(lrs, expected)


def test_rop_golden():
    epoch_is_val = [False] * 3 + [True] * 22
    epoch_has_improved = [
        False, False, False, True, True,
        True, False, False, False, True,
        False, False, False, False, False,
        False, False, False, False, False,
        False, False, False, False, False]
    cfg = SchedulerConfig({
        "name": SchedulerConst.REDUCE_OPW,
        "warmup_type": SchedulerWarmupConst.STEP, "warmup_epochs": 5,
        "rop_factor": 0.5, "rop_patience": 2, "rop_cooldown": 1,
        "rop_min_lr_factor": 0.2})
    sched = make_lr_scheduler(cfg, 1e-3, 25, 3)
    lrs = _run_scheduler(sched, 25, 3, epoch_is_val, epoch_has_improved)
    expected = [
        6.25e-05, 0.000125, 0.0001875, 0.00025, 0.0003125, 0.000375,
        0.0004375, 0.0005, 0.0005625000000000001, 0.000625, 0.0006875,
        0.00075, 0.0008125000000000001, 0.000875, 0.0009375, 0.001, 0.001,
        0.001, 0.001, 0.001, 0.001, 0.001, 0.001, 0.001, 0.001, 0.001, 0.001,
        0.001, 0.0005, 0.0005, 0.0005, 0.0005, 0.0005, 0.0005, 0.0005,
        0.0005, 0.0005, 0.0005, 0.0005, 0.0005, 0.00025, 0.00025, 0.00025,
        0.00025, 0.00025, 0.00025, 0.00025, 0.00025, 0.00025, 0.00025,
        0.00025, 0.00025, 0.0002, 0.0002, 0.0002, 0.0002, 0.0002, 0.0002,
        0.0002, 0.0002, 0.0002, 0.0002, 0.0002, 0.0002, 0.0002, 0.0002,
        0.0002, 0.0002, 0.0002, 0.0002, 0.0002, 0.0002, 0.0002, 0.0002,
        0.0002, 0.0002]
    assert np.allclose(lrs, expected)


def test_maths_sampling():
    """Frame sampling (models reference tests_nntrainer/test_maths.py)."""
    from coot_videotext_tpu.utils.maths import compute_indices
    # center sampling is deterministic
    idx = compute_indices(10, 5, is_train=False)
    assert list(idx) == [1, 3, 5, 7, 9]
    idx2 = compute_indices(100, 4, is_train=False)
    assert list(idx2) == [12, 37, 62, 87]
    # train sampling stays in range and is sorted-interval
    rng = np.random.RandomState(0)
    for n_orig, n_tgt in [(10, 5), (100, 80), (7, 7), (200, 3)]:
        idx = compute_indices(n_orig, n_tgt, is_train=True, rng=rng)
        assert len(idx) == n_tgt
        assert idx.min() >= 0 and idx.max() < n_orig
