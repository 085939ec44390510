"""
MART captioning trainer.

Behavioral port of reference mart/trainer_caption.py:106-693:
    - BertAdam (no bias correction, per-param clip) with host-side
      warmup_linear schedule over t_total = steps * epochs (:206-209)
    - EMA shadow updated per step (:349-350); validation and translation
      run with EMA weights (:431-432); EMA saved per epoch (:391-393)
    - validate_epoch = teacher-forced loss/accuracy + free-running greedy
      translation -> submission json -> language/stats/repetition eval ->
      meters; best field = CIDEr (:626-630)
    - translation + EMA files cleaned up with the checkpoints (:683-693)
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from timeit import default_timer as timer
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from coot_videotext_tpu.data.pipeline import PrefetchIterator
from coot_videotext_tpu.tasks.caption.config import (
    MartConfig, MartMetersConst as MMeters)
from coot_videotext_tpu.tasks.caption.eval_tools import get_reference_files
from coot_videotext_tpu.tasks.caption.evaluate_language import (
    evaluate_language_files)
from coot_videotext_tpu.tasks.caption.evaluate_repetition import (
    evaluate_repetition_files)
from coot_videotext_tpu.tasks.caption.evaluate_stats import (
    evaluate_stats_files)
from coot_videotext_tpu.tasks.caption.model_manager import (
    MartModelManager, build_dummy_caption_batch)
from coot_videotext_tpu.tasks.caption.steps import (
    CaptionTrainState, init_caption_train_state, make_caption_eval_step,
    make_caption_train_step, stacked_batch_sharding)
from coot_videotext_tpu.tasks.caption.translator import Translator
from coot_videotext_tpu.train import checkpoint as ckpt
from coot_videotext_tpu.train.optim import make_bertadam, warmup_linear
from coot_videotext_tpu.train.trainer_base import BaseTrainer
from coot_videotext_tpu.utils.experiments import ExperimentFilesHandler
from coot_videotext_tpu.utils.general import (
    ExperimentTypesConst, TrainerPathConst)
from coot_videotext_tpu.utils.metrics import (
    TRANSLATION_METRICS, TextMetricsConst)

TRANSLATION_METRICS_LOG = ["Bleu_4", "METEOR", "ROUGE_L", "CIDEr", "re4"]


class MartFilesHandler(ExperimentFilesHandler):
    """Adds the caption/ dir + translation files (reference :52)."""

    def __init__(self, exp_group: str, exp_name: str, run_name: str,
                 log_dir: str = TrainerPathConst.DIR_EXPERIMENTS,
                 annotations_dir: str = TrainerPathConst.DIR_ANNOTATIONS
                 ) -> None:
        super().__init__(ExperimentTypesConst.CAPTION, exp_group, exp_name,
                         run_name, log_dir=log_dir)
        self.annotations_dir = annotations_dir
        self.path_caption = self.path_base / TrainerPathConst.DIR_CAPTION

    def get_translation_files(self, epoch, split: str) -> Path:
        return self.path_caption / (
            f"{TrainerPathConst.FILE_PREFIX_TRANSL_RAW}_{epoch}_"
            f"{split}.json")

    def setup_dirs(self, *, reset: bool = False) -> None:
        super().setup_dirs(reset=reset)
        self.path_caption.mkdir(parents=True, exist_ok=True)


class MartTrainer(BaseTrainer):
    """Captioning trainer (reference MartTrainer :106)."""

    def __init__(self, cfg: MartConfig, model_mgr: MartModelManager,
                 exp_group: str, exp_name: str, run_name: str,
                 train_loader_length: int, *,
                 log_dir: str = TrainerPathConst.DIR_EXPERIMENTS,
                 annotations_dir: str = TrainerPathConst.DIR_ANNOTATIONS,
                 load_model: Optional[str] = None, load_best: bool = False,
                 load_epoch: Optional[int] = None, reset: bool = False,
                 is_test: bool = False) -> None:
        files_handler = MartFilesHandler(
            exp_group, exp_name, run_name, log_dir=log_dir,
            annotations_dir=annotations_dir)
        super().__init__(cfg, model_mgr, exp_group, exp_name, run_name,
                         train_loader_length,
                         ExperimentTypesConst.CAPTION,
                         load_model=load_model, load_best=load_best,
                         load_epoch=load_epoch, reset=reset,
                         is_test=is_test, log_dir=log_dir,
                         exp_files_handler=files_handler)
        self.cfg: MartConfig = cfg

        # caption meters
        self.metrics.add_meter(MMeters.TRAIN_LOSS_PER_WORD, use_avg=False)
        self.metrics.add_meter(MMeters.TRAIN_ACC, use_avg=False)
        self.metrics.add_meter(MMeters.VAL_LOSS_PER_WORD, use_avg=False)
        self.metrics.add_meter(MMeters.VAL_ACC, use_avg=False)
        self.metrics.add_meter(MMeters.GRAD, per_step=True,
                               reset_avg_each_epoch=True)
        for meter_name in TRANSLATION_METRICS.values():
            self.metrics.add_meter(meter_name, use_avg=False)

        # optimization (reference :190-209); freeze_glove pins the word
        # embeddings via a zero-update mask (reference model.py:79-85)
        frozen = (("word_embeddings",) if cfg.use_glove
                  and cfg.freeze_glove else ())
        self.optimizer = make_bertadam(
            beta1=0.9, beta2=0.999, eps=cfg.eps, weight_decay=0.01,
            max_grad_norm=1.0, frozen_names=frozen)
        self.t_total = train_loader_length * cfg.train.num_epochs
        self.lr_scheduler = None  # schedule computed inline (warmup_linear)

        # params + state
        self._recurrent = cfg.recurrent
        self._untied = cfg.untied or cfg.mtrans
        seed = cfg.random_seed if cfg.random_seed is not None else 0
        if self._recurrent:
            sample = build_dummy_caption_batch(cfg, cfg.vocab_size)
            self.train_state = init_caption_train_state(
                model_mgr.model, self.optimizer, jax.random.PRNGKey(seed),
                sample, ema_decay=cfg.ema_decay)
        else:
            from coot_videotext_tpu.tasks.caption.model_manager import (
                build_dummy_caption_batch_single)
            from coot_videotext_tpu.tasks.caption.steps import (
                init_caption_train_state_single)
            sample = build_dummy_caption_batch_single(
                cfg, cfg.vocab_size, untied=self._untied)
            self.train_state = init_caption_train_state_single(
                model_mgr.model, self.optimizer, jax.random.PRNGKey(seed),
                sample, ema_decay=cfg.ema_decay, untied=self._untied)
        self.logger.info(
            f"Model: {model_mgr.count_parameters(self.train_state.params):,}"
            " parameters")
        if cfg.use_glove:
            params = model_mgr.apply_glove(self.train_state.params)
            self.train_state = self.train_state._replace(params=params)
        self._root_rng = jax.random.PRNGKey(seed)

        if self._recurrent:
            self._train_step = make_caption_train_step(
                model_mgr.model, self.optimizer, ema_decay=cfg.ema_decay,
                clip_gradient=1.0, mesh=self.mesh)
            self._eval_step = make_caption_eval_step(model_mgr.model,
                                                     mesh=self.mesh)
            self._data_sharding = stacked_batch_sharding(self.mesh)
        else:
            from coot_videotext_tpu.parallel.mesh import batch_sharding
            from coot_videotext_tpu.tasks.caption.steps import (
                make_caption_eval_step_single,
                make_caption_train_step_single)
            self._train_step = make_caption_train_step_single(
                model_mgr.model, self.optimizer, ema_decay=cfg.ema_decay,
                untied=self._untied, clip_gradient=1.0, mesh=self.mesh)
            self._eval_step = make_caption_eval_step_single(
                model_mgr.model, untied=self._untied, mesh=self.mesh)
            self._data_sharding = batch_sharding(self.mesh)

        self.translator = Translator(model_mgr.model, self._eval_params,
                                     cfg, logger=self.logger)
        self.hook_post_init()

    def _eval_params(self):
        """Params used for validation/translation: EMA shadow if enabled
        (reference ema.assign :431)."""
        if self.train_state.ema is not None:
            return self.train_state.ema.shadow
        return self.train_state.params

    def current_lr(self) -> float:
        """Host-side warmup_linear schedule (reference BertAdam get_lr)."""
        progress = self.state.total_step / max(self.t_total, 1)
        return float(self.cfg.lr) * float(warmup_linear(
            jnp.float32(progress), self.cfg.lr_warmup_proportion))

    # ---------- checkpoint state ----------

    def get_model_state(self):
        state = {"params": jax.device_get(self.train_state.params)}
        if self.train_state.ema is not None:
            state["ema"] = jax.device_get(self.train_state.ema)
        return state

    def set_model_state(self, state) -> None:
        self.train_state = self.train_state._replace(
            params=state["params"],
            ema=state.get("ema", self.train_state.ema))
        self.model_mgr.was_loaded = True

    def get_opt_state(self):
        return {"opt_state": jax.device_get(self.train_state.opt_state),
                "step": int(self.train_state.step)}

    def set_opt_state(self, state) -> None:
        self.train_state = self.train_state._replace(
            opt_state=state["opt_state"], step=jnp.int32(state["step"]))

    # ---------- training ----------

    def train_model(self, train_loader, val_loader) -> None:
        self.hook_pre_train()
        for _epoch in range(self.state.current_epoch,
                            self.cfg.train.num_epochs):
            if self.check_early_stop():
                break
            train_loader.set_epoch(self.state.current_epoch)
            self.hook_pre_train_epoch()

            total_loss = 0.0
            n_word_total = 0
            n_word_correct = 0
            for step, (batch, _meta) in enumerate(
                    self._prefetch(train_loader)):
                self._heartbeat_first_dispatch()
                self.hook_pre_step_timer()
                lr = self.current_lr()
                rng = jax.random.fold_in(self._root_rng,
                                         self.state.total_step)
                self.train_state, metrics = self._train_step(
                    self.train_state, batch, jnp.float32(lr), rng)
                metrics = jax.device_get(metrics)
                self.hook_post_forward_step_timer()
                loss = float(metrics["loss"])
                total_loss += loss
                n_word_total += int(metrics["n_word"])
                n_word_correct += int(metrics["n_correct"])
                self.metrics.update_meter(MMeters.GRAD,
                                          float(metrics["grad_norm"]))
                self.hook_post_step(step, loss, lr,
                                    grad_norm=metrics.get("grad_norm"))

            loss_per_word = total_loss / max(n_word_total, 1)
            acc = n_word_correct / max(n_word_total, 1)
            self.metrics.update_meter(MMeters.TRAIN_LOSS_PER_WORD,
                                      loss_per_word)
            self.metrics.update_meter(MMeters.TRAIN_ACC, acc)

            is_val = self.check_is_val_epoch()
            has_improved = False
            if is_val:
                _loss, _score, has_improved, _metrics = \
                    self.validate_epoch(val_loader)
            # save EMA weights per epoch (reference :391-393)
            if self.train_state.ema is not None:
                ckpt.save_pytree(
                    self.exp.get_models_file_ema(self.state.current_epoch),
                    jax.device_get(self.train_state.ema))
            self.hook_post_train_and_val_epoch(is_val, has_improved)
        self.hook_post_train()

    def _prefetch(self, loader):
        """Prefetch stacked batches; step_sizes/meta stay on host."""
        def gen():
            for stacked, step_sizes, metas in loader:
                yield {"__device__": stacked,
                       "step_sizes": step_sizes, "metas": metas}

        import queue
        import threading
        q: "queue.Queue" = queue.Queue(maxsize=2)
        _SENTINEL = object()

        def producer():
            try:
                for item in gen():
                    arrays = {k: v for k, v in item["__device__"].items()
                              if isinstance(v, np.ndarray)
                              and k != "step_valid"}
                    dev = jax.device_put(arrays, self._data_sharding)
                    q.put((dev, {"step_sizes": item["step_sizes"],
                                 "metas": item["metas"]}))
            except BaseException as e:
                q.put(e)
                return
            q.put(_SENTINEL)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    # ---------- validation + translation ----------

    def validate_epoch(self, data_loader
                       ) -> Tuple[float, float, bool, Dict[str, float]]:
        self.hook_pre_val_epoch()
        forward_time_total = 0.0
        total_loss = 0.0
        n_word_total = 0
        n_word_correct = 0
        num_steps = 0
        eval_params = self._eval_params()

        batch_res = {"version": "VERSION 1.0",
                     "results": defaultdict(list),
                     "external_data": {"used": "true", "details": "ay"}}
        dataset = data_loader.dataset

        for batch, host in self._prefetch(data_loader):
            self.hook_pre_step_timer()
            out = jax.device_get(self._eval_step(eval_params, batch))
            total_loss += float(out["loss"])
            n_word_total += int(out["n_word"])
            n_word_correct += int(out["n_correct"])

            if self._recurrent:
                model_inputs = [batch["input_ids"],
                                batch["video_feature"],
                                batch["input_mask"],
                                batch["token_type_ids"]]
            elif self._untied:
                model_inputs = [batch["video_feature"],
                                batch["video_mask"],
                                batch["text_ids"], batch["text_mask"]]
            else:
                model_inputs = [batch["input_ids"],
                                batch["video_feature"],
                                batch["input_mask"],
                                batch["token_type_ids"]]
            dec = self.translator.translate_batch(
                model_inputs, use_beam=self.cfg.use_beam,
                recurrent=self.cfg.recurrent,
                untied=self.cfg.untied, xl=self.cfg.xl,
                mtrans=self.cfg.mtrans,
                beam_reference_compat=self.cfg.beam_reference_compat)

            if self._recurrent:
                for ex_idx, (step_size, cur_meta) in enumerate(
                        zip(host["step_sizes"], host["metas"])):
                    for step_idx, step_batch in enumerate(
                            dec[:step_size]):
                        batch_res["results"][cur_meta["name"]].append({
                            "sentence": dataset.convert_ids_to_sentence(
                                step_batch[ex_idx].tolist()),
                            "timestamp":
                                cur_meta["timestamp"][step_idx],
                            "gt_sentence":
                                cur_meta["gt_sentence"][step_idx],
                        })
            else:
                for ex_idx, cur_meta in enumerate(host["metas"]):
                    batch_res["results"][cur_meta["name"]].append({
                        "sentence": dataset.convert_ids_to_sentence(
                            dec[ex_idx].tolist()),
                        "timestamp": cur_meta["timestamp"],
                        "gt_sentence": cur_meta["gt_sentence"],
                    })
            self.hook_post_forward_step_timer()
            forward_time_total += self.timedelta_step_forward
            num_steps += 1

        batch_res["results"] = Translator.sort_res(batch_res["results"])
        eval_mode = self.cfg.dataset_val.split
        file_translation_raw = self.exp.get_translation_files(
            self.state.current_epoch, eval_mode)
        file_translation_raw.write_text(json.dumps(batch_res),
                                        encoding="utf8")

        reference_files = get_reference_files(
            self.cfg.dataset_val.name, self.exp.annotations_dir)[eval_mode]
        res_lang = evaluate_language_files(file_translation_raw,
                                           reference_files, verbose=False,
                                           all_scorer=True)
        res_stats = evaluate_stats_files(file_translation_raw,
                                         reference_files[0], verbose=False)
        res_rep = evaluate_repetition_files(file_translation_raw,
                                            reference_files[0],
                                            verbose=False)
        all_metrics = {**res_lang, **res_stats, **res_rep}

        flat_metrics: Dict[str, float] = {}
        for key, val in all_metrics.items():
            if isinstance(val, dict):
                for subkey, subval in val.items():
                    flat_metrics[f"{key}_{subkey}"] = subval
            else:
                flat_metrics[key] = val
        flat_metrics = {k: (float(v) if isinstance(v, (np.floating,))
                            else v) for k, v in flat_metrics.items()}

        for result_key, meter_name in TRANSLATION_METRICS.items():
            if result_key in flat_metrics:
                self.metrics.update_meter(meter_name,
                                          flat_metrics[result_key])

        self.logger.info(
            f"Done with translation, epoch {self.state.current_epoch} "
            f"split {eval_mode}")
        self.logger.info(", ".join(
            f"{name} {flat_metrics[name]:.2%}"
            for name in TRANSLATION_METRICS_LOG if name in flat_metrics))

        loss_per_word = total_loss / max(n_word_total, 1)
        accuracy = n_word_correct / max(n_word_total, 1)
        self.metrics.update_meter(MMeters.VAL_LOSS_PER_WORD,
                                  loss_per_word)
        self.metrics.update_meter(MMeters.VAL_ACC, accuracy)
        self.logger.info(
            f"Loss {loss_per_word:.5f} Acc {accuracy:.3%} total "
            f"{timer() - self.timer_val_epoch:.3f}s, forward "
            f"{forward_time_total / max(num_steps, 1):.3f}s")

        if self.cfg.val.det_best_field == "cider":
            val_score = flat_metrics["CIDEr"]
        else:
            raise NotImplementedError(
                f"best field {self.cfg.val.det_best_field} not known")
        is_best = self.check_is_new_best(val_score)
        self.hook_post_val_epoch(loss_per_word, is_best)

        if self.is_test:
            self.metrics.feed_metrics(False, self.state.total_step,
                                      self.state.current_epoch)
            metrics_file = (self.exp.path_base /
                            f"val_ep_{self.state.current_epoch}.json")
            self.metrics.save_epoch_to_file(metrics_file)
            self.logger.info(f"Saved validation results to {metrics_file}")
            # meteor -999 patch-up (reference :643-656)
            best_ep = self.exp.find_best_epoch()
            if (self.cfg.dataset_val.split == "val"
                    and self.load_ep == best_ep
                    == self.state.current_epoch):
                metrics_file = self.exp.get_metrics_epoch_file(best_ep)
                if metrics_file.is_file():
                    metrics_data = json.loads(
                        metrics_file.read_text(encoding="utf8"))
                    meteor_dict = dict(
                        metrics_data[TextMetricsConst.METEOR])
                    if ((meteor_dict.get(best_ep, 0) + 999) ** 2) < 1e-4:
                        meteor_dict[best_ep] = flat_metrics["METEOR"]
                        metrics_data[TextMetricsConst.METEOR] = list(
                            meteor_dict.items())
                        metrics_file.write_text(json.dumps(metrics_data),
                                                encoding="utf8")

        return total_loss, val_score, is_best, flat_metrics

    def get_files_for_cleanup(self, epoch: int) -> List[Path]:
        """(reference :683)."""
        return [self.exp.get_translation_files(epoch, split="val"),
                self.exp.get_models_file_ema(epoch)]
