"""
Base trainer: the host-side experiment lifecycle.

Behavioral port of reference nntrainer/trainer_base.py:25-765 minus the
torch/cuda machinery, which is replaced by the JAX execution model:
    - device setup / DataParallel wrap / GradScaler (reference :100-133)
      -> a jax.sharding.Mesh created once; train/eval steps are jitted SPMD
      programs; bf16 needs no loss scaling.
    - checkpoint auto-load best/last/epoch/file (:144-176), early stopping
      (:285), val scheduling (:312), best-epoch compare with rel/abs
      threshold (:632), per-epoch/step lifecycle hooks (:364-630),
      checkpoint save/load/cleanup (:672-753) are kept 1:1 so trainerstate /
      metrics files remain schema-compatible with the reference tooling.
    - GPU profiling meters -> jax device memory_stats + psutil RAM.

Subclasses implement train_model / validate_epoch and the four state
accessors (get/set model/optimizer state pytrees).
"""

from __future__ import annotations

import datetime
import os
from pathlib import Path
from timeit import default_timer as timer
from typing import Any, List, Optional

import jax
import psutil

from coot_videotext_tpu.parallel.mesh import get_mesh
from coot_videotext_tpu.train import checkpoint as ckpt
from coot_videotext_tpu.train.schedule import LRScheduler
from coot_videotext_tpu.utils import yaml_utils
from coot_videotext_tpu.utils.experiments import ExperimentFilesHandler
from coot_videotext_tpu.utils.general import (
    LOGGER_NAME, MetricComparisonConst, TrainerPathConst, create_logger)
from coot_videotext_tpu.utils.metrics import DefaultMetricsConst as Metrics
from coot_videotext_tpu.utils.metrics import MetricsWriter

PyTree = Any


class BaseTrainer:
    """Host-side training lifecycle (reference BaseTrainer :25)."""

    def __init__(self, cfg, model_mgr, exp_group: str, exp_name: str,
                 run_name: str, train_loader_length: int, model_type: str,
                 *, load_model: Optional[str] = None, load_best: bool = False,
                 load_epoch: Optional[int] = None, reset: bool = False,
                 is_test: bool = False,
                 log_dir: str = TrainerPathConst.DIR_EXPERIMENTS,
                 exp_files_handler: Optional[ExperimentFilesHandler] = None
                 ) -> None:
        self.cfg = cfg
        self.model_mgr = model_mgr
        self.is_test = is_test

        # experiment files + logging (subclasses may pass a custom handler,
        # e.g. MartFilesHandler with the caption/ dir)
        self.exp = exp_files_handler or ExperimentFilesHandler(
            model_type, exp_group, exp_name, run_name, log_dir=log_dir)
        self.exp.setup_dirs(reset=reset)
        self.logger = create_logger(LOGGER_NAME, log_dir=self.exp.path_logs)
        self.logger.info(
            f"Experiment: {exp_group}/{exp_name}/{run_name} "
            f"type {model_type} in {self.exp.path_base}")

        # device mesh (replaces cuda/DataParallel setup, reference :119-133)
        self.mesh = get_mesh(getattr(cfg, "mesh_shape", None))
        # rbg PRNG on TPU: measured 21ms/step cheaper than threefry for
        # dropout-mask generation on the yc2_2d3d workload (dropout is
        # augmentation randomness; stream differs from threefry)
        prng_impl = getattr(cfg, "prng_impl", None)
        if prng_impl is None and jax.default_backend() == "tpu":
            prng_impl = "rbg"
        if prng_impl:
            jax.config.update("jax_default_prng_impl", prng_impl)
        # persistent compilation cache (shared with bench.py/tests):
        # restarts and repeated runs of the same experiment skip every
        # unchanged train/eval-program compile
        _cache = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            str(Path(__file__).resolve().parents[2] / ".jax_cache"))
        try:
            jax.config.update("jax_compilation_cache_dir", _cache)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.0)
        except Exception:  # pragma: no cover - cache is best-effort
            pass
        self.logger.info(
            f"Mesh: {dict(zip(self.mesh.axis_names, self.mesh.devices.shape))}"
            f" on {self.mesh.devices.size} x "
            f"{self.mesh.devices.flat[0].platform}; "
            f"compute dtype {cfg.compute_dtype}")

        # state persisted per epoch as json
        from coot_videotext_tpu.config.base import BaseTrainerState
        self.state = BaseTrainerState()

        # metrics
        self.metrics = MetricsWriter(self.exp)

        self.logger.info(f"Random seed: {self.cfg.random_seed}")
        yaml_utils.dump_yaml_config_file(
            self.exp.path_base / "config.yaml", self.cfg.config_orig)

        # checkpoint auto-load decision (same contract as reference
        # :144-176: explicit file > requested epoch > best > last > fresh)
        self.load_model = load_model
        self.load, self.load_ep = self._resolve_auto_load(
            load_epoch, load_best)

        # default meters (reference :179-201)
        self.metrics.add_meter(Metrics.TRAIN_EPOCH, use_avg=False)
        self.metrics.add_meter(Metrics.TIME_TOTAL, use_avg=False)
        self.metrics.add_meter(Metrics.TIME_VAL, use_avg=False)
        self.metrics.add_meter(Metrics.VAL_LOSS, use_avg=False)
        self.metrics.add_meter(Metrics.VAL_BEST_FIELD, use_avg=False)
        self.metrics.add_meter(Metrics.TRAIN_LR, per_step=True,
                               use_avg=False)
        self.metrics.add_meter(Metrics.TRAIN_GRAD_CLIP, per_step=True,
                               reset_avg_each_epoch=True)
        self.metrics.add_meter(Metrics.TRAIN_LOSS, per_step=True,
                               reset_avg_each_epoch=True)
        self.metrics.add_meter(Metrics.PROFILE_GPU_MEM_USED, per_step=True)
        self.metrics.add_meter(Metrics.PROFILE_RAM_USED, per_step=True)
        self.metrics.add_meter(Metrics.TIME_STEP_FORWARD, per_step=True,
                               use_value=False)
        self.metrics.add_meter(Metrics.TIME_STEP_BACKWARD, per_step=True,
                               use_value=False)
        self.metrics.add_meter(Metrics.TIME_STEP_TOTAL, per_step=True,
                               use_value=False)
        self.metrics.add_meter(Metrics.TIME_STEP_OTHER, per_step=True,
                               use_value=False)

        self.train_loader_length = train_loader_length

        # set by subclass
        self.optimizer = None
        self.lr_scheduler: Optional[LRScheduler] = None

        # transient timers
        self.timer_step: float = 0
        self.timer_step_forward: float = 0
        self.timer_step_backward: float = 0
        self.timer_train_start: float = 0
        self.timer_train_epoch: float = 0
        self.timer_val_epoch: float = 0
        self.timedelta_step_forward: float = 0
        self.timedelta_step_backward: float = 0

    def _resolve_auto_load(self, load_epoch, load_best):
        """Decide what (if anything) hook_post_init should restore.

        Returns ``(load, epoch)``: ``epoch == -1`` with ``load`` True means
        "warmstart from the self.load_model file". Priority matches the
        reference (trainer_base.py:144-176): an explicit model file beats
        everything, then a requested epoch, then the best validated epoch
        (falling back to the newest when no validation ran), then the
        newest checkpoint; a fresh experiment starts from scratch.
        """
        if self.load_model:
            if load_epoch:
                raise ValueError(
                    "--load_model warmstarts from a file; it cannot be "
                    "combined with --load_epoch.")
            return True, -1
        known = self.exp.get_existing_checkpoints()
        if not known:
            self.logger.info("No checkpoints found, starting from scratch.")
            return False, -1
        if load_epoch:
            if load_best:
                raise ValueError(
                    "--load_epoch and --load_best are mutually exclusive.")
            return True, load_epoch
        if load_best:
            epoch = self.exp.find_best_epoch()
            if epoch == -1:
                epoch = known[-1]  # nothing validated yet: newest wins
            self.logger.info(f"Best ckpt to load: {epoch}")
            return True, epoch
        self.logger.info(f"Last ckpt to load: {known[-1]}")
        return True, known[-1]

    # ---------- must override ----------

    def train_model(self, train_loader, val_loader) -> None:
        raise NotImplementedError

    def validate_epoch(self, val_loader):
        raise NotImplementedError

    def get_model_state(self) -> PyTree:
        raise NotImplementedError

    def set_model_state(self, state: PyTree) -> None:
        raise NotImplementedError

    def get_opt_state(self) -> PyTree:
        raise NotImplementedError

    def set_opt_state(self, state: PyTree) -> None:
        raise NotImplementedError

    def get_files_for_cleanup(self, _epoch: int) -> List[Path]:
        return []

    # ---------- epoch decisions ----------

    def check_early_stop(self) -> bool:
        """Early stop after N bad epochs (reference :285)."""
        current_epoch = self.state.current_epoch - 1
        best_epoch = self.exp.find_best_epoch()
        if best_epoch == -1:
            best_epoch = current_epoch
        bad_epochs = current_epoch - best_epoch
        self.logger.info(
            f"Experiment ---------- {self.exp.exp_group}/"
            f"{self.exp.exp_name}/{self.exp.run_name} ---------- epoch "
            f"current/best/bad: {current_epoch}/{best_epoch}/{bad_epochs}")
        if 0 <= self.cfg.val.det_best_terminate_after <= bad_epochs:
            self.logger.info(
                f"No improvement since {bad_epochs} epochs, end of training.")
            return True
        return False

    def check_is_val_epoch(self) -> bool:
        """Validation scheduling (reference :312)."""
        do_val = (self.state.current_epoch % self.cfg.val.val_freq == 0
                  and self.cfg.val.val_freq > -1
                  and self.state.current_epoch >= self.cfg.val.val_start)
        return do_val or (self.state.current_epoch
                          == self.cfg.train.num_epochs)

    def check_is_new_best(self, result: float) -> bool:
        """Update best-field bookkeeping (reference :336)."""
        old_best = self.state.det_best_field_best
        is_best = self._check_if_current_score_is_best(result, old_best)
        self.state.det_best_field_current = result
        if is_best:
            self.state.det_best_field_best = result
            self.logger.info(f"New best: {result:.5f}")
        else:
            best_str = ("" if old_best is None
                        else f" (best {old_best:.5f})")
            self.logger.info(f"Validation score {result:.5f}{best_str}")
        return is_best

    def _check_if_current_score_is_best(self, current: float,
                                        best: Optional[float]) -> bool:
        """Rel/abs threshold compare (reference :632)."""
        cp_mode = self.cfg.val.det_best_compare_mode
        th_mode = self.cfg.val.det_best_threshold_mode
        thresh = self.cfg.val.det_best_threshold_value
        if best is None:
            return True
        if cp_mode == MetricComparisonConst.VAL_DET_BEST_MODE_MIN:
            if th_mode == MetricComparisonConst.VAL_DET_BEST_TH_MODE_REL:
                return current < best * (1 - thresh)
            return current < best - thresh
        if cp_mode == MetricComparisonConst.VAL_DET_BEST_MODE_MAX:
            if th_mode == MetricComparisonConst.VAL_DET_BEST_TH_MODE_REL:
                return current > best * (1 + thresh)
            return current > best + thresh
        raise ValueError(f"Unknown compare mode {cp_mode}")

    # ---------- experiment-level hooks ----------

    def hook_post_init(self) -> None:
        """Load the requested checkpoint (reference :364)."""
        if not self.load:
            return
        if self.load_model:
            self.logger.info(
                f"Loading model from checkpoint file {self.load_model}")
            if str(self.load_model).endswith(".pth"):
                # reference torch checkpoint: convert on the fly
                from coot_videotext_tpu.utils import torch_convert
                self.set_model_state(torch_convert.convert_model_file(
                    self.load_model, self.get_model_state()))
            else:
                self.set_model_state(ckpt.restore_pytree(
                    self.load_model, self.get_model_state()))
            return
        self.logger.info(f"Loading Ep {self.load_ep}.")
        self._load_checkpoint(self.load_ep)
        if not self.is_test:
            # loaded epoch N -> now training epoch N+1 (reference :385-388)
            self.state.current_epoch += 1

    def hook_pre_train(self) -> None:
        self.state.start_epoch = self.state.current_epoch
        self.timer_train_start = timer()
        self.logger.info(
            f"Training from {self.state.current_epoch} to "
            f"{self.cfg.train.num_epochs}")

    def hook_post_train(self) -> None:
        self.logger.info(
            f"In total, training {self.state.current_epoch} epochs took "
            f"{self.state.time_total:.3f}s "
            f"({self.state.time_total - self.state.time_val:.3f}s train / "
            f"{self.state.time_val:.3f}s val)")

    # ---------- epoch hooks ----------

    def hook_pre_train_epoch(self) -> None:
        self.timer_train_epoch = timer()
        self.timer_step = timer()
        self.metrics.hook_epoch_start()
        now = str(datetime.datetime.now()).split(".")[0]
        self.logger.info(f"{now} ---------- Training epoch: "
                         f"{self.state.current_epoch}")

    def hook_pre_val_epoch(self) -> None:
        self.timer_val_epoch = timer()
        self.timer_step = timer()

    def hook_post_val_epoch(self, val_loss: float, is_best: bool) -> None:
        self.state.time_val += timer() - self.timer_val_epoch
        self.metrics.update_meter(Metrics.VAL_LOSS, val_loss)
        self.metrics.update_meter(Metrics.VAL_BEST_FIELD,
                                  self.state.det_best_field_current)
        self.state.infos_val_epochs.append(self.state.current_epoch)
        self.state.infos_val_steps.append(self.state.total_step)
        self.state.infos_val_is_good.append(int(is_best))

    def hook_post_train_and_val_epoch(self, is_val: bool,
                                      has_improved: bool) -> None:
        self.state.time_total += timer() - self.timer_train_epoch
        if self.lr_scheduler is not None:
            self.lr_scheduler.step_epoch(is_val, has_improved)
        self.metrics.update_meter(Metrics.TIME_TOTAL, self.state.time_total)
        self.metrics.update_meter(Metrics.TIME_VAL, self.state.time_val)
        self.metrics.update_meter(Metrics.TRAIN_EPOCH,
                                  self.state.current_epoch)
        time_total = max(self.metrics.meters[Metrics.TIME_STEP_TOTAL].avg,
                         1e-9)
        parts_str = []
        for field in (Metrics.TIME_STEP_FORWARD, Metrics.TIME_STEP_BACKWARD,
                      Metrics.TIME_STEP_OTHER):
            val = self.metrics.meters[field].avg
            name = str(field).split("_")[-1]
            parts_str += [name, f"{val * 1000:.2f}ms",
                          f"{val / time_total:.1%}"]
        self.logger.info(
            f"Step time: Total {time_total * 1000:.0f}ms "
            + " ".join(parts_str))
        self.metrics.feed_metrics(False, self.state.total_step,
                                  self.state.current_epoch)
        self._save_checkpoint()
        self._cleanup_files()
        self.state.current_epoch += 1

    # ---------- step hooks ----------

    def _heartbeat_first_dispatch(self) -> None:
        """Log once right before the process's first device dispatch.

        A detached run's first step can spend minutes in XLA
        compilation; without this line the run log looks hung right
        after "Training epoch: N" with no way to tell compile from
        crash (that exact silence cost round 3 its reference-scale
        A/B evidence).
        """
        if getattr(self, "_first_dispatch_done", False):
            return
        self._first_dispatch_done = True
        self.logger.info(
            "Dispatching first step (XLA compiles the program on first "
            "use; minutes at scale, cached in .jax_cache for restarts). "
            "The next step line proves it ran.")

    def hook_pre_step_timer(self) -> None:
        self.timer_step_forward = timer()

    def hook_post_forward_step_timer(self) -> None:
        self.timer_step_backward = timer()
        self.timedelta_step_forward = (self.timer_step_backward
                                       - self.timer_step_forward)

    def hook_post_backward_step_timer(self) -> None:
        self.timedelta_step_backward = timer() - self.timer_step_backward

    def hook_post_step(self, epoch_step: int, loss: float, lr: float,
                       additional_log: Optional[str] = None,
                       grad_norm: Optional[float] = None) -> None:
        """Log, profile, feed meters, step scheduler (reference :523)."""
        self.state.last_grad_norm = (float(grad_norm)
                                     if grad_norm is not None else 0.0)
        total_step_time = timer() - self.timer_step
        other_t = (total_step_time - self.timedelta_step_forward
                   - self.timedelta_step_backward)
        self.metrics.update_meter(Metrics.TIME_STEP_FORWARD,
                                  self.timedelta_step_forward)
        self.metrics.update_meter(Metrics.TIME_STEP_BACKWARD,
                                  self.timedelta_step_backward)
        self.metrics.update_meter(Metrics.TIME_STEP_TOTAL, total_step_time)
        self.metrics.update_meter(Metrics.TIME_STEP_OTHER, other_t)
        self.timer_step = timer()

        log_step = self.cfg.logging.step_train
        if log_step > 0 and epoch_step % log_step == 0:
            gn_str = (f" Grad {self.state.last_grad_norm:.3f}"
                      if grad_norm is not None else "")
            extra = f" {additional_log}" if additional_log else ""
            self.logger.info(
                f"E{self.state.current_epoch}[{epoch_step:4d}/"
                f"{self.train_loader_length}] T {total_step_time:.3f}s "
                f"LR {lr:.1e} L {loss:.4f}{gn_str}{extra}")

        gpu_step = self.cfg.logging.step_gpu
        if gpu_step > 0 and epoch_step % gpu_step == 0:
            self.profile_device()

        self.metrics.update_meter(Metrics.TRAIN_LR, lr)
        self.metrics.update_meter(Metrics.TRAIN_LOSS, loss)
        if grad_norm is not None:
            self.metrics.update_meter(Metrics.TRAIN_GRAD_CLIP,
                                      self.state.last_grad_norm)

        self.state.epoch_step = epoch_step
        self.state.total_step += 1
        self.metrics.feed_metrics(True, self.state.total_step,
                                  self.state.current_epoch)
        if self.lr_scheduler is not None:
            self.lr_scheduler.step()

    def profile_device(self) -> None:
        """Device HBM + host RAM profiling (replaces GPUtil,
        reference trainer_base.py:571-602)."""
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            used_gb = stats.get("bytes_in_use", 0) / 1024 ** 3
            self.metrics.update_meter(Metrics.PROFILE_GPU_MEM_USED, used_gb)
        except Exception:  # platform without memory_stats
            pass
        ram_gb = psutil.Process().memory_info().rss / 1024 ** 3
        self.metrics.update_meter(Metrics.PROFILE_RAM_USED, ram_gb)

    # ---------- checkpointing ----------

    def _save_checkpoint(self) -> None:
        """Save epoch artifacts (reference :672)."""
        epoch = self.state.current_epoch
        self.state.save(self.exp.get_trainerstate_file(epoch))
        self.metrics.save_epoch(epoch)
        ckpt.save_pytree(self.exp.get_models_file(epoch),
                         self.get_model_state())
        if self.cfg.saving.save_opt_state:
            ckpt.save_pytree(self.exp.get_optimizer_file(epoch),
                             self.get_opt_state())
            if self.lr_scheduler is not None:
                yaml_utils.dump_json(
                    self.lr_scheduler.state_dict(),
                    self.exp.get_scheduler_file(epoch))

    def _load_checkpoint(self, epoch: int) -> None:
        """Load epoch artifacts (reference :693)."""
        self.state.load(self.exp.get_trainerstate_file(epoch))
        self.metrics.load_epoch(epoch)
        self.set_model_state(ckpt.restore_pytree(
            self.exp.get_models_file(epoch), self.get_model_state()))
        if not self.is_test:
            opt_file = self.exp.get_optimizer_file(epoch)
            if ckpt.checkpoint_exists(opt_file):
                self.set_opt_state(ckpt.restore_pytree(
                    opt_file, self.get_opt_state()))
            sched_file = self.exp.get_scheduler_file(epoch)
            if self.lr_scheduler is not None and sched_file.is_file():
                self.lr_scheduler.load_state_dict(
                    yaml_utils.load_json(sched_file))
        else:
            self.logger.info(
                "Don't load optimizer and scheduler during inference.")

    def _cleanup_files(self) -> None:
        """Keep best+last+keep_freq checkpoints (reference :717)."""
        ep_nums = self.exp.get_existing_checkpoints()
        if not ep_nums:
            return
        best_ep = self.exp.find_best_epoch()
        last_ep = ep_nums[-1]
        cleaned = []
        for ep_num in ep_nums:
            if ep_num in (best_ep, last_ep):
                continue
            if (self.cfg.saving.keep_freq > 0
                    and ep_num % self.cfg.saving.keep_freq == 0):
                continue
            files = [self.exp.get_models_file(ep_num),
                     self.exp.get_optimizer_file(ep_num),
                     self.exp.get_trainerstate_file(ep_num),
                     self.exp.get_scheduler_file(ep_num),
                     self.exp.get_metrics_epoch_file(ep_num),
                     self.exp.get_metrics_step_file(ep_num)]
            files += self.get_files_for_cleanup(ep_num)
            for file in files:
                file = Path(file)
                if file.is_dir():
                    ckpt.delete_checkpoint(file)
                elif file.is_file():
                    os.remove(file)
            cleaned.append(ep_num)
        if cleaned:
            self.logger.debug(f"Deleted epochs: {cleaned}")

    def close(self) -> None:
        self.metrics.close()
