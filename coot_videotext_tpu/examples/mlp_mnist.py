"""
Minimal third experiment type `mlp`: an MLP classifier on an MNIST-like
dataset — the boilerplate demo for adding a new experiment type and the
workhorse for the integration tests (train / checkpoint / resume /
bit-determinism), mirroring reference nntrainer/examples/mlp_mnist.py:1-319.

The reference downloads real MNIST; this image has no network egress, so a
deterministic synthetic digit dataset (class-dependent gaussian blobs,
28x28) stands in — same shapes, same learning contract.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from coot_videotext_tpu.config import base as trainer_configs
from coot_videotext_tpu.parallel.mesh import (
    batch_sharding, donate_argnums_for, replicated_sharding)
from coot_videotext_tpu.train.optim import AdamState, make_adam
from coot_videotext_tpu.train.schedule import make_lr_scheduler
from coot_videotext_tpu.train.trainer_base import BaseTrainer
from coot_videotext_tpu.utils.general import TrainerPathConst

EXP_TYPE = "mlp"


# ---------- data ----------

def make_synthetic_mnist(num_train: int = 512, num_val: int = 256,
                         seed: int = 42
                         ) -> Tuple[Tuple[np.ndarray, np.ndarray],
                                    Tuple[np.ndarray, np.ndarray]]:
    """Deterministic MNIST-like data: per-class blob patterns + noise."""
    rng = np.random.RandomState(seed)
    patterns = rng.randn(10, 28 * 28).astype(np.float32)

    def make_split(n, split_seed):
        r = np.random.RandomState(split_seed)
        labels = r.randint(0, 10, n)
        images = (patterns[labels]
                  + 0.5 * r.randn(n, 28 * 28).astype(np.float32))
        return images.astype(np.float32), labels.astype(np.int32)

    return make_split(num_train, seed + 1), make_split(num_val, seed + 2)


class MLPMNISTDataLoader:
    def __init__(self, images, labels, batch_size: int, *,
                 shuffle: bool, seed: int = 0) -> None:
        self.images, self.labels = images, labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return (len(self.images) + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.images)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        for start in range(0, n, self.batch_size):
            idx = order[start:start + self.batch_size]
            # pad to static batch size; padded rows weighted 0
            pad = self.batch_size - len(idx)
            images = self.images[idx]
            labels = self.labels[idx]
            weights = np.ones(len(idx), np.float32)
            if pad:
                images = np.concatenate([images, images[:1].repeat(pad, 0)])
                labels = np.concatenate([labels, labels[:1].repeat(pad)])
                weights = np.concatenate([weights, np.zeros(pad,
                                                            np.float32)])
            yield {"images": images, "labels": labels, "weights": weights}


# ---------- config ----------

class MLPMNISTExperimentConfig(trainer_configs.BaseExperimentConfig):
    """(reference mlp_mnist.py MLPMNISTExperimentConfig)."""

    def __init__(self, config: Dict[str, Any]) -> None:
        super().__init__(config)
        self.name = "config_mlp"
        self.train = self.pop_group("train",
                                    trainer_configs.BaseTrainConfig)
        self.val = self.pop_group("val", trainer_configs.BaseValConfig)
        self.dataset_train = self.pop_group(
            "dataset_train", trainer_configs.BaseDatasetConfig)
        self.dataset_val = self.pop_group(
            "dataset_val", trainer_configs.BaseDatasetConfig)
        self.logging = self.pop_group(
            "logging", trainer_configs.BaseLoggingConfig)
        self.saving = self.pop_group(
            "saving", trainer_configs.BaseSavingConfig)
        self.optimizer = self.pop_group(
            "optimizer", trainer_configs.OptimizerConfig)
        self.lr_scheduler = self.pop_group(
            "lr_scheduler", trainer_configs.SchedulerConfig)
        self.mlp_hidden_dim: int = self.config.pop("mlp_hidden_dim", 128)
        self.post_init()


# ---------- model ----------

class MLPModel(nn.Module):
    hidden_dim: int = 128
    num_classes: int = 10

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.hidden_dim)(images)
        h = nn.relu(h)
        return nn.Dense(self.num_classes)(h)


class MLPModelManager:
    """(reference MLPModelManager)."""

    def __init__(self, cfg: MLPMNISTExperimentConfig) -> None:
        self.cfg = cfg
        self.model = MLPModel(hidden_dim=cfg.mlp_hidden_dim)
        self.was_loaded = False

    def init_params(self, seed: int):
        return self.model.init(jax.random.PRNGKey(seed),
                               jnp.zeros((2, 28 * 28)))["params"]

    @staticmethod
    def count_parameters(params) -> int:
        return sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))


# ---------- trainer ----------

class MLPMNISTTrainer(BaseTrainer):
    """(reference MLPMNISTTrainer)."""

    def __init__(self, cfg: MLPMNISTExperimentConfig,
                 model_mgr: MLPModelManager, exp_group: str,
                 exp_name: str, run_name: str, train_loader_length: int,
                 *, log_dir: str = TrainerPathConst.DIR_EXPERIMENTS,
                 load_model: Optional[str] = None,
                 load_best: bool = False,
                 load_epoch: Optional[int] = None, reset: bool = False,
                 is_test: bool = False) -> None:
        super().__init__(cfg, model_mgr, exp_group, exp_name, run_name,
                         train_loader_length, EXP_TYPE,
                         load_model=load_model, load_best=load_best,
                         load_epoch=load_epoch, reset=reset,
                         is_test=is_test, log_dir=log_dir)
        self.optimizer = make_adam(0.9, cfg.optimizer.adam_beta2,
                                   cfg.optimizer.adam_eps,
                                   cfg.optimizer.weight_decay,
                                   cfg.optimizer.weight_decay_for_bias)
        self.lr_scheduler = make_lr_scheduler(
            cfg.lr_scheduler, cfg.optimizer.lr, cfg.train.num_epochs,
            train_loader_length, self.logger)
        seed = cfg.random_seed if cfg.random_seed is not None else 0
        params = model_mgr.init_params(seed)
        self.params = params
        self.opt_state = self.optimizer.init(params)

        model = model_mgr.model
        optimizer = self.optimizer

        def train_step(params, opt_state, batch, lr):
            def loss_fn(p):
                logits = model.apply({"params": p}, batch["images"])
                logp = jax.nn.log_softmax(logits.astype(jnp.float32))
                nll = -jnp.take_along_axis(
                    logp, batch["labels"][:, None].astype(jnp.int32),
                    axis=1)[:, 0]
                w = batch["weights"]
                return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            new_params, new_opt = optimizer.update(grads, opt_state,
                                                   params, lr)
            return new_params, new_opt, loss

        def eval_step(params, batch):
            logits = model.apply({"params": params}, batch["images"])
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            w = batch["weights"]
            correct = jnp.sum(
                (pred == batch["labels"]).astype(jnp.float32) * w)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            nll = -jnp.take_along_axis(
                logp, batch["labels"][:, None].astype(jnp.int32),
                axis=1)[:, 0]
            return {"correct": correct, "count": jnp.sum(w),
                    "loss_sum": jnp.sum(nll * w)}

        rep = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        self._train_step = jax.jit(train_step,
                                   in_shardings=(rep, rep, data, rep),
                                   out_shardings=rep)
        self._eval_step = jax.jit(eval_step, in_shardings=(rep, data),
                                  out_shardings=rep)
        self._data_sharding = data
        self.hook_post_init()

    # ---------- state ----------

    def get_model_state(self):
        return {"params": jax.device_get(self.params)}

    def set_model_state(self, state) -> None:
        self.params = state["params"]
        self.model_mgr.was_loaded = True

    def get_opt_state(self):
        return {"opt_state": jax.device_get(self.opt_state)}

    def set_opt_state(self, state) -> None:
        self.opt_state = state["opt_state"]

    # ---------- loops ----------

    def train_model(self, train_loader, val_loader) -> None:
        self.hook_pre_train()
        for _epoch in range(self.state.current_epoch,
                            self.cfg.train.num_epochs):
            if self.check_early_stop():
                break
            train_loader.set_epoch(self.state.current_epoch)
            self.hook_pre_train_epoch()
            for step, batch in enumerate(train_loader):
                self.hook_pre_step_timer()
                batch = jax.device_put(batch, self._data_sharding)
                lr = self.lr_scheduler.current_lr
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, batch, jnp.float32(lr))
                loss = float(jax.device_get(loss))
                self.hook_post_forward_step_timer()
                self.hook_post_step(step, loss, lr)
            is_val = self.check_is_val_epoch()
            has_improved = False
            if is_val:
                _loss, _acc, has_improved = self.validate_epoch(
                    val_loader)
            self.hook_post_train_and_val_epoch(is_val, has_improved)
        self.hook_post_train()

    def validate_epoch(self, val_loader) -> Tuple[float, float, bool]:
        self.hook_pre_val_epoch()
        correct = count = loss_sum = 0.0
        for batch in val_loader:
            batch = jax.device_put(batch, self._data_sharding)
            out = jax.device_get(self._eval_step(self.params, batch))
            correct += float(out["correct"])
            count += float(out["count"])
            loss_sum += float(out["loss_sum"])
        accuracy = correct / max(count, 1)
        val_loss = loss_sum / max(count, 1)
        self.logger.info(f"Validation loss {val_loss:.5f} "
                         f"acc {accuracy:.3%}")
        is_best = self.check_is_new_best(accuracy)
        self.hook_post_val_epoch(val_loss, is_best)
        return val_loss, accuracy, is_best
