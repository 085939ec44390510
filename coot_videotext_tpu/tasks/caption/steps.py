"""
Jitted caption train/eval steps (MART family) over a device mesh.

Replaces the reference per-step host loop (mart/trainer_caption.py:253-350):
the S-sentence recursive forward, label-smoothing loss, backward,
grad-clip, BertAdam update and EMA shadow update fuse into ONE SPMD
program. The warmup_linear schedule stays on host — lr enters as a traced
scalar (the reference bakes the schedule into BertAdam.get_lr; value
parity preserved by computing the same factor host-side).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from coot_videotext_tpu.parallel.mesh import (
    batch_sharding, donate_argnums_for, replicated_sharding)
from coot_videotext_tpu.train.loss_caption import token_accuracy_counts
from coot_videotext_tpu.train.optim import (
    Optimizer, clip_by_global_norm, ema_init, ema_update)

PyTree = Any

# batch keys stacked as (S, N, ...): shard dim 1 (N); step_valid is host-only
_STACKED_KEYS = ("input_ids", "input_labels", "input_mask",
                 "token_type_ids", "video_feature")


class CaptionTrainState(NamedTuple):
    params: PyTree
    opt_state: PyTree
    ema: Optional[PyTree]  # EMAState or None
    step: jnp.ndarray


def stacked_batch_sharding(mesh):
    """(S, N, ...) arrays shard the batch axis (dim 1)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P(None, "data"))


def make_caption_train_step(model, optimizer: Optimizer, *,
                            ema_decay: float, clip_gradient: float = 1.0,
                            mesh=None, state_shardings=None) -> Callable:
    """step(state, batch, lr, rng) -> (state, metrics). metrics:
    loss (sum over steps), n_correct, n_word, grad_norm.

    state_shardings (parallel/tp.py shard_state_for_tp) enables tensor
    parallelism over a `model` mesh axis: rule-matched BERT projection
    kernels shard, GSPMD inserts the activation collectives."""

    use_ema = ema_decay > 0

    def step_fn(state: CaptionTrainState, batch: Dict[str, jnp.ndarray],
                lr: jnp.ndarray, rng: jax.Array
                ) -> Tuple[CaptionTrainState, Dict[str, jnp.ndarray]]:

        def loss_fn(params):
            loss, scores_list = model.apply(
                {"params": params},
                batch["input_ids"], batch["video_feature"],
                batch["input_mask"], batch["token_type_ids"],
                batch["input_labels"], deterministic=False,
                rngs={"dropout": rng})
            return loss, scores_list

        (loss, scores_list), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        n_correct = jnp.float32(0)
        n_word = jnp.float32(0)
        for idx, scores in enumerate(scores_list):
            c, w = token_accuracy_counts(scores, batch["input_labels"][idx])
            n_correct += c
            n_word += w

        metrics = {"loss": loss, "n_correct": n_correct, "n_word": n_word}
        if clip_gradient > 0:
            grads, norm = clip_by_global_norm(grads, clip_gradient)
            metrics["grad_norm"] = norm
        new_params, new_opt = optimizer.update(grads, state.opt_state,
                                               state.params, lr)
        new_ema = state.ema
        if use_ema:
            new_ema = ema_update(state.ema, new_params, ema_decay,
                                 state.step)
        return CaptionTrainState(new_params, new_opt, new_ema,
                                 state.step + 1), metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    rep = replicated_sharding(mesh)
    state_sh = state_shardings if state_shardings is not None else rep
    data = stacked_batch_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(state_sh, data, rep, rep),
                   out_shardings=(state_sh, rep),
                   donate_argnums=donate_argnums_for(mesh))


def make_caption_eval_step(model, *, mesh=None) -> Callable:
    """Teacher-forced eval: eval(params, batch) ->
    {loss, n_correct, n_word}. Pass EMA shadow params to eval with EMA
    weights (reference trainer_caption.py:431-432 ema.assign)."""

    def eval_fn(params, batch: Dict[str, jnp.ndarray]
                ) -> Dict[str, jnp.ndarray]:
        loss, scores_list = model.apply(
            {"params": params},
            batch["input_ids"], batch["video_feature"],
            batch["input_mask"], batch["token_type_ids"],
            batch["input_labels"], deterministic=True)
        n_correct = jnp.float32(0)
        n_word = jnp.float32(0)
        for idx, scores in enumerate(scores_list):
            c, w = token_accuracy_counts(scores, batch["input_labels"][idx])
            n_correct += c
            n_word += w
        return {"loss": loss, "n_correct": n_correct, "n_word": n_word}

    if mesh is None:
        return jax.jit(eval_fn)
    rep = replicated_sharding(mesh)
    data = stacked_batch_sharding(mesh)
    return jax.jit(eval_fn, in_shardings=(rep, data),
                   out_shardings=rep)


def init_caption_train_state(model, optimizer: Optimizer, rng: jax.Array,
                             sample_batch: Dict[str, jnp.ndarray], *,
                             ema_decay: float) -> CaptionTrainState:
    variables = model.init(
        {"params": rng, "dropout": rng},
        sample_batch["input_ids"], sample_batch["video_feature"],
        sample_batch["input_mask"], sample_batch["token_type_ids"],
        sample_batch["input_labels"], deterministic=True)
    params = variables["params"]
    ema = ema_init(params) if ema_decay > 0 else None
    return CaptionTrainState(params, optimizer.init(params), ema,
                             jnp.int32(0))


# ---------- single-sentence variants (untied / mtrans / single) ----------

def single_batch_sharding(mesh):
    """Single-sentence batches are (N, ...): shard dim 0."""
    return batch_sharding(mesh)


def _single_forward(model, untied: bool, params, batch, rng=None):
    kwargs = {"deterministic": rng is None}
    if rng is not None:
        kwargs["rngs"] = {"dropout": rng}
    if untied:
        return model.apply(
            {"params": params}, batch["video_feature"],
            batch["video_mask"], batch["text_ids"], batch["text_mask"],
            batch["text_labels"], **kwargs)
    return model.apply(
        {"params": params}, batch["input_ids"], batch["video_feature"],
        batch["input_mask"], batch["token_type_ids"],
        batch["input_labels"], **kwargs)


def make_caption_train_step_single(model, optimizer: Optimizer, *,
                                   ema_decay: float, untied: bool,
                                   clip_gradient: float = 1.0,
                                   mesh=None) -> Callable:
    """Train step for the non-recurrent model family (reference
    trainer_caption.py:285-325 batch layouts)."""
    use_ema = ema_decay > 0
    label_key = "text_labels" if untied else "input_labels"

    def step_fn(state, batch, lr, rng):
        def loss_fn(params):
            loss, scores = _single_forward(model, untied, params, batch,
                                           rng)
            return loss, scores

        (loss, scores), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        n_correct, n_word = token_accuracy_counts(scores,
                                                  batch[label_key])
        metrics = {"loss": loss, "n_correct": n_correct,
                   "n_word": n_word}
        if clip_gradient > 0:
            grads, norm = clip_by_global_norm(grads, clip_gradient)
            metrics["grad_norm"] = norm
        new_params, new_opt = optimizer.update(grads, state.opt_state,
                                               state.params, lr)
        new_ema = state.ema
        if use_ema:
            new_ema = ema_update(state.ema, new_params, ema_decay,
                                 state.step)
        return CaptionTrainState(new_params, new_opt, new_ema,
                                 state.step + 1), metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    rep = replicated_sharding(mesh)
    data = single_batch_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(rep, data, rep, rep),
                   out_shardings=(rep, rep),
                   donate_argnums=donate_argnums_for(mesh))


def make_caption_eval_step_single(model, *, untied: bool,
                                  mesh=None) -> Callable:
    label_key = "text_labels" if untied else "input_labels"

    def eval_fn(params, batch):
        loss, scores = _single_forward(model, untied, params, batch)
        n_correct, n_word = token_accuracy_counts(scores,
                                                  batch[label_key])
        return {"loss": loss, "n_correct": n_correct, "n_word": n_word}

    if mesh is None:
        return jax.jit(eval_fn)
    rep = replicated_sharding(mesh)
    data = single_batch_sharding(mesh)
    return jax.jit(eval_fn, in_shardings=(rep, data), out_shardings=rep)


def init_caption_train_state_single(model, optimizer: Optimizer,
                                    rng: jax.Array, sample_batch, *,
                                    ema_decay: float,
                                    untied: bool) -> CaptionTrainState:
    kwargs = {"deterministic": True}
    if untied:
        variables = model.init(
            {"params": rng, "dropout": rng},
            sample_batch["video_feature"], sample_batch["video_mask"],
            sample_batch["text_ids"], sample_batch["text_mask"],
            sample_batch["text_labels"], **kwargs)
    else:
        variables = model.init(
            {"params": rng, "dropout": rng},
            sample_batch["input_ids"], sample_batch["video_feature"],
            sample_batch["input_mask"], sample_batch["token_type_ids"],
            sample_batch["input_labels"], **kwargs)
    params = variables["params"]
    ema = ema_init(params) if ema_decay > 0 else None
    return CaptionTrainState(params, optimizer.init(params), ema,
                             jnp.int32(0))
