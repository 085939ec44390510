"""
Retrieval trainer: COOT training/validation on a TPU mesh.

Behavioral port of reference coot/trainer_retrieval.py:26-499. Differences
are the execution model, not semantics:
    - the per-step autocast-forward / backward / optimizer sequence
      (reference :264-285) is ONE jitted SPMD train step (steps.py) fed by a
      double-buffered host prefetch; the GradScaler disappears (bf16).
    - validation embeddings stay on device until concatenated; retrieval
      ranks are computed on device (tasks/retrieval/eval.py) instead of the
      numpy argsort loop.
    - embedding export writes the same h5 schema incl. *_before_norm keys
      (reference :404-415), with padded clip/sentence slots compacted away.
"""

from __future__ import annotations

from timeit import default_timer as timer
from typing import Any, Dict, Optional, Tuple

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from coot_videotext_tpu.data.pipeline import prefetch_to_device
from coot_videotext_tpu.parallel.mesh import batch_sharding
from coot_videotext_tpu.tasks.retrieval import eval as retrieval
from coot_videotext_tpu.tasks.retrieval.config import (
    CootMetersConst as CMeters, ExperimentTypesConst, RetrievalConfig)
from coot_videotext_tpu.tasks.retrieval.model_manager import (
    RetrievalModelManager, build_dummy_retrieval_batch)
from coot_videotext_tpu.tasks.retrieval.steps import (
    TrainState, init_train_state, make_retrieval_eval_step,
    make_retrieval_train_scan, make_retrieval_train_step)
from coot_videotext_tpu.train.optim import make_optimizer
from coot_videotext_tpu.train.schedule import make_lr_scheduler
from coot_videotext_tpu.train.trainer_base import BaseTrainer
from coot_videotext_tpu.utils.general import TrainerPathConst
from coot_videotext_tpu.utils.metrics import DefaultMetricsConst as Metrics

EMB_KEYS = ("vid_emb", "par_emb", "clip_emb", "sent_emb", "vid_context",
            "par_context")


class RetrievalTrainer(BaseTrainer):
    """COOT retrieval trainer (reference RetrievalTrainer :26)."""

    def __init__(self, cfg: RetrievalConfig,
                 model_mgr: RetrievalModelManager, exp_group: str,
                 exp_name: str, run_name: str, train_loader_length: int,
                 *, log_dir: str = TrainerPathConst.DIR_EXPERIMENTS,
                 load_model: Optional[str] = None, load_best: bool = False,
                 load_epoch: Optional[int] = None, reset: bool = False,
                 is_test: bool = False) -> None:
        super().__init__(
            cfg, model_mgr, exp_group, exp_name, run_name,
            train_loader_length, ExperimentTypesConst.RETRIEVAL,
            load_model=load_model, load_best=load_best,
            load_epoch=load_epoch, reset=reset, is_test=is_test,
            log_dir=log_dir)
        self.cfg: RetrievalConfig = cfg

        # loss meters (reference :87-103)
        self.metrics.add_meter(CMeters.VAL_LOSS_CC, use_avg=False)
        self.metrics.add_meter(CMeters.VAL_LOSS_CONTRASTIVE, use_avg=False)
        self.metrics.add_meter(CMeters.TRAIN_LOSS_CC, per_step=True,
                               use_avg=False)
        self.metrics.add_meter(CMeters.TRAIN_LOSS_CONTRASTIVE,
                               per_step=True, use_avg=False)
        for modality in CMeters.RET_MODALITIES:
            for metric in CMeters.RET_METRICS:
                metric_class = "val_base" if metric == "r1" else "val_ret"
                self.metrics.add_meter(f"{metric_class}/{modality}-{metric}",
                                       use_avg=False)

        # optimization: RAdam + reduce-on-plateau (reference :109-117)
        self.optimizer = make_optimizer(cfg.optimizer)
        self.lr_scheduler = make_lr_scheduler(
            cfg.lr_scheduler, cfg.optimizer.lr, cfg.train.num_epochs,
            train_loader_length, self.logger)

        # params + train state
        seed = cfg.random_seed if cfg.random_seed is not None else 0
        params = model_mgr.init_params(seed,
                                       build_dummy_retrieval_batch(cfg))
        self.train_state = TrainState(
            params, self.optimizer.init(params), jnp.int32(0))
        self.logger.info(
            f"Model: {model_mgr.count_parameters(params):,} parameters")
        self._root_rng = jax.random.PRNGKey(seed)

        # jitted steps, built lazily per data path (dense vs HBM store)
        self._loss_weights = cfg.train.contrastive_loss_config.as_dict()
        self._margin = cfg.train.contrastive_loss_config.margin
        self._train_steps: Dict[bool, Any] = {}
        self._train_scans: Dict[int, Any] = {}
        self._eval_steps: Dict[bool, Any] = {}
        self._data_sharding = batch_sharding(self.mesh)

        self.hook_post_init()

    @staticmethod
    def _loader_mode(loader):
        """(use_store, device_sampling_cfg, extra step args, slab) per
        loader. slab = packed transfers: the per-batch feature slabs ride
        inside the batch (retrieval_dataset.py collate_slab)."""
        store = getattr(loader, "device_store", None)
        meta = getattr(loader, "device_meta", None)
        if meta is not None:
            sampling = {"shapes": meta.shapes,
                        "max_frames": meta.max_frames}
            args = (store.vid_store, store.text_store, meta.tables)
            return True, sampling, args, False
        if store is not None:
            return True, None, (store.vid_store, store.text_store), False
        if getattr(loader, "pack_transfer", False):
            return False, None, (), True
        return False, None, (), False

    def _get_train_step(self, use_store, sampling, slab=False):
        key = (use_store, sampling is not None, slab)
        if key not in self._train_steps:
            # slab rows carry host-applied noise already; the on-device
            # noise is only for the HBM-store gather path
            noisy = use_store
            self._train_steps[key] = make_retrieval_train_step(
                self.model_mgr.model_train, self.optimizer,
                loss_weights=self._loss_weights, margin=self._margin,
                loss_cycle_cons=self.cfg.train.loss_cycle_cons,
                clip_gradient=self.cfg.train.clip_gradient,
                mesh=self.mesh, use_store=use_store, slab=slab,
                frames_noise=(self.cfg.dataset_train.frames_noise
                              if noisy else 0.0),
                words_noise=(self.cfg.dataset_train.words_noise
                             if noisy else 0.0),
                device_sampling=sampling)
        return self._train_steps[key]

    def _get_train_scan(self, sampling):
        if "scan" not in self._train_scans:
            self._train_scans["scan"] = make_retrieval_train_scan(
                self.model_mgr.model_train, self.optimizer,
                loss_weights=self._loss_weights, margin=self._margin,
                loss_cycle_cons=self.cfg.train.loss_cycle_cons,
                clip_gradient=self.cfg.train.clip_gradient,
                mesh=self.mesh,
                frames_noise=self.cfg.dataset_train.frames_noise,
                words_noise=self.cfg.dataset_train.words_noise,
                device_sampling=sampling)
        return self._train_scans["scan"]

    def _get_eval_step(self, use_store, sampling, slab=False):
        key = (use_store, sampling is not None, slab)
        if key not in self._eval_steps:
            self._eval_steps[key] = make_retrieval_eval_step(
                self.model_mgr.model_eval, loss_weights=self._loss_weights,
                margin=self._margin,
                loss_cycle_cons=self.cfg.train.loss_cycle_cons,
                mesh=self.mesh, use_store=use_store, slab=slab,
                device_sampling=sampling)
        return self._eval_steps[key]

    # ---------- state accessors for checkpointing ----------

    def get_model_state(self):
        return {"params": jax.device_get(self.train_state.params)}

    def set_model_state(self, state) -> None:
        self.train_state = self.train_state._replace(params=state["params"])
        self.model_mgr.was_loaded = True

    def get_opt_state(self):
        return {"opt_state": jax.device_get(self.train_state.opt_state),
                "step": int(self.train_state.step)}

    def set_opt_state(self, state) -> None:
        self.train_state = self.train_state._replace(
            opt_state=state["opt_state"],
            step=jnp.int32(state["step"]))

    # ---------- training ----------

    def train_model(self, train_loader, val_loader) -> None:
        self.hook_pre_train()
        use_store, sampling, store_args, slab = \
            self._loader_mode(train_loader)
        k_dispatch = getattr(self.cfg.train, "steps_per_dispatch", 1)
        scan_capable = sampling is not None and k_dispatch > 1
        if k_dispatch > 1 and sampling is None:
            self.logger.warning(
                "train.steps_per_dispatch > 1 needs the fully "
                "device-resident pipeline (preload_device + "
                "pad_fixed_shapes + sample_on_device); falling back to "
                "per-step dispatch.")
        scan_warned = False
        for _epoch in range(self.state.current_epoch,
                            self.cfg.train.num_epochs):
            if self.check_early_stop():
                break
            train_loader.set_epoch(self.state.current_epoch)
            self.hook_pre_train_epoch()

            # scan-fused group dispatch (one compiled program per K steps)
            # unless a per-step warmup is active this epoch, whose
            # step-varying LR a constant-LR group would flatten
            use_scan = scan_capable and not (
                self.lr_scheduler is not None
                and self.lr_scheduler.lr_varies_per_step())
            if scan_capable and not use_scan and not scan_warned:
                self.logger.info(
                    "Per-step warmup active: dispatching per-step until "
                    "warmup ends, then scan-fused groups of "
                    f"{k_dispatch}.")
                scan_warned = True

            if use_scan:
                self._train_epoch_scan(train_loader, sampling, store_args,
                                       k_dispatch)
            else:
                self._train_epoch_per_step(train_loader, use_store,
                                           sampling, store_args, slab)

            is_val = self.check_is_val_epoch()
            has_improved = False
            if is_val:
                _val_loss, _score, has_improved = self.validate_epoch(
                    val_loader)
            self.hook_post_train_and_val_epoch(is_val, has_improved)
        self.hook_post_train()

    def _train_epoch_per_step(self, train_loader, use_store, sampling,
                              store_args, slab=False) -> None:
        train_step = self._get_train_step(use_store, sampling, slab)
        for step, (batch, _meta) in enumerate(prefetch_to_device(
                train_loader, sharding=self._data_sharding)):
            self._heartbeat_first_dispatch()
            self.hook_pre_step_timer()
            rng = jax.random.fold_in(self._root_rng,
                                     self.state.total_step)
            lr = self.lr_scheduler.current_lr
            self.train_state, metrics = train_step(
                self.train_state, batch, jnp.float32(lr), rng,
                *store_args)
            # the jitted step covers forward+backward+update; attribute
            # it to the forward timer (backward meter stays 0)
            metrics = jax.device_get(metrics)
            self.hook_post_forward_step_timer()
            loss = float(metrics["loss_total"])
            self.metrics.update_meter(CMeters.TRAIN_LOSS_CONTRASTIVE,
                                      float(metrics["loss_contrastive"]))
            self.metrics.update_meter(CMeters.TRAIN_LOSS_CC,
                                      float(metrics["loss_cc"]))
            self.hook_post_step(
                step, loss, lr,
                grad_norm=metrics.get("grad_norm"))

    def _train_epoch_scan(self, train_loader, sampling, store_args,
                          k_dispatch: int) -> None:
        """
        One epoch through the scan-fused program: the host ships (K, B)
        datapoint ids per dispatch (tasks/retrieval/steps.py
        make_retrieval_train_scan) and feeds the stacked per-step metrics
        back into the same meters/hooks as per-step dispatch. Tail groups
        are padded with step_valid=False identity steps, so one compiled
        program serves every epoch length.
        """
        scan_step = self._get_train_scan(sampling)
        bsz = self.cfg.train.batch_size
        # id batches are a few hundred bytes each: collect the epoch
        batches = list(train_loader)
        for g0 in range(0, len(batches), k_dispatch):
            group = batches[g0:g0 + k_dispatch]
            kk = len(group)
            ids = np.zeros((k_dispatch, bsz), np.int32)
            bv = np.zeros((k_dispatch, bsz), bool)
            sv = np.zeros(k_dispatch, bool)
            for i, b in enumerate(group):
                ids[i] = b["dp_idx"]
                bv[i] = b["batch_valid"]
                sv[i] = True
            # keep one live sample on padded steps (finite masked math;
            # the identity carry discards their result entirely)
            bv[kk:, 0] = True

            self._heartbeat_first_dispatch()
            self.hook_pre_step_timer()
            rng = jax.random.fold_in(self._root_rng,
                                     self.state.total_step)
            lr = self.lr_scheduler.current_lr
            self.train_state, metrics = scan_step(
                self.train_state, jnp.asarray(ids), jnp.asarray(bv),
                jnp.asarray(sv), jnp.float32(lr), rng, *store_args)
            metrics = jax.device_get(metrics)
            self.hook_post_forward_step_timer()
            # attribute the group wall-clock evenly across its steps so
            # the time meters keep per-step semantics (both the forward
            # slice and TIME_STEP_TOTAL, which hook_post_step derives from
            # self.timer_step — without the rebase below the whole group
            # would be booked to its first step and ~0 to the rest)
            self.timedelta_step_forward /= kk
            group_time = timer() - self.timer_step
            for i in range(kk):
                self.timer_step = timer() - group_time / kk
                self.metrics.update_meter(
                    CMeters.TRAIN_LOSS_CONTRASTIVE,
                    float(metrics["loss_contrastive"][i]))
                self.metrics.update_meter(CMeters.TRAIN_LOSS_CC,
                                          float(metrics["loss_cc"][i]))
                gn = metrics.get("grad_norm")
                self.hook_post_step(
                    g0 + i, float(metrics["loss_total"][i]), lr,
                    grad_norm=None if gn is None else float(gn[i]))

    # ---------- validation ----------

    def validate_epoch(self, val_loader, *,
                       val_clips: bool = False, save_embs: bool = False
                       ) -> Tuple[float, float, bool]:
        """One validation epoch (reference :312). Returns
        (val_loss, val_score, is_best)."""
        self.hook_pre_val_epoch()
        val_clips = val_clips or (
            self.cfg.val.val_clips
            and self.state.current_epoch % self.cfg.val.val_clips_freq == 0)
        save_embs = save_embs or self.cfg.val.save_embeddings

        collected: Dict[str, list] = {k: [] for k in EMB_KEYS}
        collected_raw: Dict[str, list] = {k: [] for k in EMB_KEYS}
        save_clip_num, save_sent_num, save_keys = [], [], []
        loss_total = contr_total = cc_total = 0.0
        forward_time_total = 0.0
        num_steps = 0
        rng = jax.random.PRNGKey(42)

        use_store, sampling, store_args, slab = \
            self._loader_mode(val_loader)
        eval_step = self._get_eval_step(use_store, sampling, slab)
        for batch, meta in prefetch_to_device(
                val_loader, sharding=self._data_sharding):
            t0 = timer()
            embs, parts = eval_step(self.train_state.params, batch,
                                    rng, *store_args)
            embs = jax.device_get(embs)
            parts = jax.device_get(parts)
            forward_time_total += timer() - t0
            num_steps += 1
            loss_total += float(parts["loss_total"])
            contr_total += float(parts["loss_contrastive"])
            cc_total += float(parts["loss_cc"])

            bv = np.asarray(jax.device_get(batch["batch_valid"]))
            cv = embs["clip_valid"].astype(bool) & bv[:, None]
            sv = embs["sent_valid"].astype(bool) & bv[:, None]
            for key in EMB_KEYS:
                arr_n = embs[key]
                arr_r = embs[f"{key}_before_norm"]
                if key in ("clip_emb", "sent_emb"):
                    valid = cv if key == "clip_emb" else sv
                    collected[key].append(arr_n[valid])
                    collected_raw[key].append(arr_r[valid])
                else:
                    collected[key].append(arr_n[bv])
                    collected_raw[key].append(arr_r[bv])
            save_clip_num += list(embs["clip_num"][bv])
            save_sent_num += list(embs["sent_num"][bv])
            save_keys += list(meta["key"])  # meta holds only real points

        data_norm = {k: np.concatenate(v, axis=0)
                     for k, v in collected.items()}
        data_raw = {k: np.concatenate(v, axis=0)
                    for k, v in collected_raw.items()}

        if save_embs:
            self.exp.path_embeddings.mkdir(parents=True, exist_ok=True)
            filename = (self.exp.path_embeddings /
                        f"embeddings_{self.state.current_epoch}.h5")
            with h5py.File(filename, "w") as h5:
                h5["clip_num"] = np.asarray(save_clip_num, np.int64)
                h5["sent_num"] = np.asarray(save_sent_num, np.int64)
                h5["key"] = [str(k) for k in save_keys]
                for key in EMB_KEYS:
                    h5[key] = data_norm[key]
                    h5[f"{key}_before_norm"] = data_raw[key]
            self.logger.info(f"Saved embeddings to {filename}\n")

        loss_total /= max(num_steps, 1)
        contr_total /= max(num_steps, 1)
        cc_total /= max(num_steps, 1)
        forward_time_total /= max(num_steps, 1)
        self.metrics.update_meter(CMeters.VAL_LOSS_CONTRASTIVE, contr_total)
        self.metrics.update_meter(CMeters.VAL_LOSS_CC, cc_total)

        self.logger.info(retrieval.VALHEADER)
        res_v2p, res_p2v, sum_vp_at_1, str_vp = retrieval.compute_retrieval(
            data_norm, "vid_emb", "par_emb", print_fn=self.logger.info)
        res_c2s = res_s2c = sum_cs_at_1 = None
        str_cs = ""
        if val_clips:
            res_c2s, res_s2c, sum_cs_at_1, str_cs = \
                retrieval.compute_retrieval(
                    data_norm, "clip_emb", "sent_emb",
                    print_fn=self.logger.info)

        for modality, dict_ret in zip(CMeters.RET_MODALITIES,
                                      [res_v2p, res_p2v, res_c2s, res_s2c]):
            if dict_ret is None:
                continue
            for metric in CMeters.RET_METRICS:
                logger_class = "val_base" if metric == "r1" else "val_ret"
                self.metrics.update_meter(
                    f"{logger_class}/{modality}-{metric}",
                    dict_ret[metric])

        self.logger.info(
            f"Loss {loss_total:.5f} (Contr: {contr_total:.5f}, "
            f"CC: {cc_total:.5f}) Retrieval: {str_vp}{str_cs}total "
            f"{timer() - self.timer_val_epoch:.3f}s, forward "
            f"{forward_time_total:.3f}s")

        # best-field selection (reference :456-464)
        if self.cfg.val.det_best_field == "val_score_at_1":
            val_score = sum_vp_at_1
        elif self.cfg.val.det_best_field == "val_loss":
            val_score = loss_total
        elif self.cfg.val.det_best_field == "val_clip_sent_score_at_1":
            assert sum_cs_at_1 is not None, (
                "det_best_field val_clip_sent_score_at_1 needs val_clips")
            val_score = sum_cs_at_1
        else:
            raise NotImplementedError(
                f"best field {self.cfg.val.det_best_field} not known")

        is_best = self.check_is_new_best(val_score)
        self.hook_post_val_epoch(loss_total, is_best)
        return loss_total, val_score, is_best
