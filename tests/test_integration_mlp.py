"""
Integration tests via the `mlp` example experiment type, mirroring the
reference's integration_train.py (train -> delete trainer -> resume from
checkpoint -> inference-only reload) and integration_deter.py
(bit-identical validation results for two trainings from the same seed).
"""

import numpy as np

from coot_videotext_tpu.examples.mlp_mnist import (
    MLPMNISTDataLoader, MLPMNISTExperimentConfig, MLPMNISTTrainer,
    MLPModelManager, make_synthetic_mnist)
from coot_videotext_tpu.utils.yaml_utils import load_yaml_config_file


def make_cfg(num_epochs=2):
    config = load_yaml_config_file("config/mlp/default/mnist.yaml")
    config["train"]["num_epochs"] = num_epochs
    return MLPMNISTExperimentConfig(config)


def make_loaders(cfg):
    (tx, ty), (vx, vy) = make_synthetic_mnist(num_train=256, num_val=128)
    return (MLPMNISTDataLoader(tx, ty, cfg.train.batch_size,
                               shuffle=True, seed=0),
            MLPMNISTDataLoader(vx, vy, cfg.val.batch_size,
                               shuffle=False))


def run_training(log_dir, num_epochs, run_name="run1"):
    cfg = make_cfg(num_epochs)
    train_loader, val_loader = make_loaders(cfg)
    mgr = MLPModelManager(cfg)
    trainer = MLPMNISTTrainer(cfg, mgr, "default", "mnist", run_name,
                              len(train_loader), log_dir=log_dir)
    trainer.train_model(train_loader, val_loader)
    accs = [v for _, v in
            trainer.metrics.storage_epoch["val_base/best_field"]]
    losses = [v for _, v in trainer.metrics.storage_epoch["val_base/loss"]]
    epoch = trainer.state.current_epoch
    trainer.close()
    return cfg, accs, losses, epoch


def test_train_resume_and_reload(tmp_path):
    log_dir = str(tmp_path / "exp")
    cfg, accs, _losses, epoch = run_training(log_dir, 2)
    assert epoch == 2
    assert accs[-1] > 0.5  # synthetic digits are easily learnable

    # resume training for one more epoch
    cfg3 = make_cfg(3)
    train_loader, val_loader = make_loaders(cfg3)
    mgr = MLPModelManager(cfg3)
    trainer = MLPMNISTTrainer(cfg3, mgr, "default", "mnist", "run1",
                              len(train_loader), log_dir=log_dir)
    assert trainer.load and trainer.state.current_epoch == 2
    trainer.train_model(train_loader, val_loader)
    assert trainer.state.current_epoch == 3
    trainer.close()

    # inference-only reload of the best epoch
    cfg_t = make_cfg(3)
    train_loader, val_loader = make_loaders(cfg_t)
    mgr = MLPModelManager(cfg_t)
    trainer = MLPMNISTTrainer(cfg_t, mgr, "default", "mnist", "run1",
                              len(train_loader), log_dir=log_dir,
                              load_best=True, is_test=True)
    loss, acc, _ = trainer.validate_epoch(val_loader)
    assert np.isfinite(loss) and acc > 0.5
    trainer.close()


def test_determinism(tmp_path):
    """Two trainings from seed 0 produce bit-identical validation results
    (reference integration_deter.py:55-66)."""
    _, accs_a, losses_a, _ = run_training(str(tmp_path / "a"), 2, "runA")
    _, accs_b, losses_b, _ = run_training(str(tmp_path / "b"), 2, "runB")
    np.testing.assert_array_equal(accs_a, accs_b)
    np.testing.assert_array_equal(losses_a, losses_b)
