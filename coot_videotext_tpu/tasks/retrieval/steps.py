"""
Jitted retrieval train/eval steps over a device mesh.

TPU-native replacement for the reference's per-step host loop
(reference coot/trainer_retrieval.py:235-310): forward of the 4-network
hierarchy, total loss, backward, optimizer update — all fused into ONE
jit-compiled SPMD program. The batch is sharded over the mesh `data` axis,
parameters are replicated; the loss is written on the GLOBAL batch, so GSPMD
inserts the embedding all-gather and the gradient psum (the reference's
negatives = full batch semantics is preserved exactly; SURVEY.md §2.9).

The learning rate enters as a traced scalar: the host-side
reduce-on-plateau scheduler never triggers a recompile.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from coot_videotext_tpu.parallel.mesh import (
    batch_sharding, donate_argnums_for, replicated_sharding)
from coot_videotext_tpu.train.losses import (
    compute_total_retrieval_loss, l2_normalize)
from coot_videotext_tpu.train.optim import (
    Optimizer, clip_by_global_norm, global_norm)

PyTree = Any


class TrainState(NamedTuple):
    """Replicated train state: parameters + optimizer state + step count."""
    params: PyTree
    opt_state: PyTree
    step: jnp.ndarray  # int32 scalar


def make_retrieval_train_step(
        model, optimizer: Optimizer, *,
        loss_weights: Dict[str, float], margin: float,
        loss_cycle_cons: float, clip_gradient: float = -1.0,
        mesh=None, use_store: bool = False, slab: bool = False,
        frames_noise: float = 0.0, words_noise: float = 0.0,
        device_sampling: Optional[Dict[str, Any]] = None,
        state_shardings=None) -> Callable:
    """
    Build the jitted train step:
        step(state, batch, lr, rng) -> (new_state, metrics)
    or, with use_store (HBM-resident features, data/device_store.py):
        step(state, batch, lr, rng, vid_store, text_store) -> same —
    the batch then carries int32 gather indices and the dense features are
    materialized on device (with on-device truncnorm feature noise).
    With device_sampling (= {"shapes", "max_frames"}; requires use_store)
    the batch is just {"dp_idx", "batch_valid"} and frame sampling + index
    construction run on device too (tables passed as the last arg) — the
    host ships a few hundred bytes per step.
    With slab (packed transfers, retrieval_dataset.py collate_slab) the
    per-batch row slabs ride INSIDE the batch as vid_store/text_store and
    are gathered the same way; noise is already in the slab rows (host
    collate), so the on-device noise stays off.

    metrics holds the loss parts (loss_total/loss_contrastive/loss_cc/...)
    and, when clip_gradient > 0, the pre-clip grad norm (the reference only
    computes the norm when clipping, trainer_base.py:545-554).
    """
    if device_sampling is not None:
        assert use_store
    if slab:
        assert not use_store and device_sampling is None

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray],
                lr: jnp.ndarray, rng: jax.Array,
                vid_store=None, text_store=None, tables=None
                ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng_dropout, rng_cc, rng_noise, rng_sample = \
            jax.random.split(rng, 4)
        if slab:
            batch = dict(batch)
            vid_store = batch.pop("vid_store")
            text_store = batch.pop("text_store")
        if device_sampling is not None:
            from coot_videotext_tpu.data.device_store import (
                device_sample_batch)
            batch = device_sample_batch(
                tables, batch["dp_idx"], device_sampling["shapes"],
                device_sampling["max_frames"], rng=rng_sample,
                batch_valid=batch["batch_valid"])
        if use_store or slab:
            from coot_videotext_tpu.data.device_store import (
                gather_dense_batch)
            batch = gather_dense_batch(
                batch, vid_store, text_store, frames_noise=frames_noise,
                words_noise=words_noise, rng=rng_noise)

        def loss_fn(params):
            out = model.apply({"params": params}, batch,
                              deterministic=False,
                              rngs={"dropout": rng_dropout})
            visual = {k: out[k] for k in
                      ("vid_emb", "clip_emb", "vid_context", "clip_valid",
                       "clip_num")}
            text = {k: out[k] for k in
                    ("par_emb", "sent_emb", "par_context", "sent_valid",
                     "sent_num")}
            loss, parts = compute_total_retrieval_loss(
                visual, text, loss_weights, margin, loss_cycle_cons,
                rng=rng_cc, batch_valid=batch["batch_valid"])
            return loss, parts

        (_, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        metrics = dict(parts)
        if clip_gradient > 0:
            grads, norm = clip_by_global_norm(grads, clip_gradient)
            metrics["grad_norm"] = norm
        new_params, new_opt = optimizer.update(
            grads, state.opt_state, state.params, lr)
        new_state = TrainState(new_params, new_opt, state.step + 1)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    # with a `model` mesh axis, state_shardings (parallel/tp.py) carries
    # the tensor-parallel parameter layout; default is replicated params
    state_sh = state_shardings if state_shardings is not None else rep
    shardings = [state_sh, data, rep, rep]
    if use_store:
        shardings += [rep, rep]  # stores replicated across the mesh
    if device_sampling is not None:
        shardings += [rep]  # metadata tables replicated
    return jax.jit(
        step_fn,
        in_shardings=tuple(shardings),
        out_shardings=(state_sh, rep),
        donate_argnums=donate_argnums_for(mesh))


def make_retrieval_eval_step(model, *, loss_weights: Dict[str, float],
                             margin: float, loss_cycle_cons: float,
                             mesh=None, use_store: bool = False,
                             slab: bool = False,
                             device_sampling: Optional[Dict[str, Any]]
                             = None) -> Callable:
    """
    Build the jitted eval step:
        eval_step(params, batch, rng) -> (embeddings dict, loss parts)
    (+ trailing (vid_store, text_store) args with use_store; no feature
    noise at eval, matching the reference's train-only noise). With slab
    (packed transfers) the per-batch row slabs ride inside the batch.

    Embeddings come back both raw and L2-normalized (reference
    trainer_retrieval.py:382-402 collects raw then normalizes manually on
    host; here both live on device).
    """

    def eval_fn(params, batch: Dict[str, jnp.ndarray], rng: jax.Array,
                vid_store=None, text_store=None, tables=None
                ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        if slab:
            batch = dict(batch)
            vid_store = batch.pop("vid_store")
            text_store = batch.pop("text_store")
        if device_sampling is not None:
            from coot_videotext_tpu.data.device_store import (
                device_sample_batch)
            # rng=None: deterministic center sampling (reference val path)
            batch = device_sample_batch(
                tables, batch["dp_idx"], device_sampling["shapes"],
                device_sampling["max_frames"], rng=None,
                batch_valid=batch["batch_valid"])
        if use_store or slab:
            from coot_videotext_tpu.data.device_store import (
                gather_dense_batch)
            batch = gather_dense_batch(batch, vid_store, text_store)
        out = model.apply({"params": params}, batch, deterministic=True)
        visual = {k: out[k] for k in
                  ("vid_emb", "clip_emb", "vid_context", "clip_valid",
                   "clip_num")}
        text = {k: out[k] for k in
                ("par_emb", "sent_emb", "par_context", "sent_valid",
                 "sent_num")}
        _, parts = compute_total_retrieval_loss(
            visual, text, loss_weights, margin, loss_cycle_cons,
            rng=rng, batch_valid=batch["batch_valid"])
        embs = {
            "vid_emb_before_norm": out["vid_emb"],
            "par_emb_before_norm": out["par_emb"],
            "clip_emb_before_norm": out["clip_emb"],
            "sent_emb_before_norm": out["sent_emb"],
            "vid_context_before_norm": out["vid_context"],
            "par_context_before_norm": out["par_context"],
            "vid_emb": l2_normalize(out["vid_emb"]),
            "par_emb": l2_normalize(out["par_emb"]),
            "clip_emb": l2_normalize(out["clip_emb"]),
            "sent_emb": l2_normalize(out["sent_emb"]),
            "vid_context": l2_normalize(out["vid_context"]),
            "par_context": l2_normalize(out["par_context"]),
            "clip_valid": out["clip_valid"],
            "sent_valid": out["sent_valid"],
            "clip_num": out["clip_num"],
            "sent_num": out["sent_num"],
        }
        return embs, parts

    if mesh is None:
        return jax.jit(eval_fn)
    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    shardings = [rep, data, rep]
    if use_store:
        shardings += [rep, rep]
    if device_sampling is not None:
        shardings += [rep]
    return jax.jit(eval_fn, in_shardings=tuple(shardings),
                   out_shardings=(data, rep))


def init_train_state(model, optimizer: Optimizer, rng: jax.Array,
                     sample_batch: Dict[str, jnp.ndarray]) -> TrainState:
    """Initialize parameters + optimizer state from a (small) sample batch."""
    variables = model.init({"params": rng, "dropout": rng}, sample_batch,
                           deterministic=True)
    params = variables["params"]
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, jnp.int32(0))


def make_retrieval_train_scan(
        model, optimizer: Optimizer, *,
        loss_weights: Dict[str, float], margin: float,
        loss_cycle_cons: float, clip_gradient: float = -1.0,
        mesh=None, frames_noise: float = 0.0, words_noise: float = 0.0,
        device_sampling: Dict[str, Any] = None,
        state_shardings=None) -> Callable:
    """
    Multi-step dispatch fusion: scan K train steps inside ONE jitted
    program. Requires the fully device-resident pipeline
    (device_sampling): the host ships a (K, B) datapoint-id array and a
    (K, B) validity array for the whole group — one dispatch per K steps
    instead of per step, eliminating per-step host round trips entirely.

        scan_step(state, dp_idx (K,B), batch_valid (K,B), step_valid (K,),
                  lr, rng, vid_store, text_store, tables)
            -> (state, metrics stacked over K)

    `step_valid` marks padded tail steps (epochs whose length is not a
    multiple of K): an invalid step computes nothing into the state — the
    carried (params, opt_state, step) pass through unchanged — so one
    compiled program serves every group size. Metrics carry a
    `step_valid` channel so the host can skip the padded entries.

    The learning rate is constant within a group — identical semantics to
    per-step dispatch for the epoch-driven schedulers the retrieval task
    uses (reduce-on-plateau). The trainer auto-degrades to per-step
    dispatch while a per-step warmup is active (train/schedule.py
    lr_varies_per_step), so warmup is never flattened within a group.
    """
    assert device_sampling is not None

    def group_fn(state: TrainState, dp_idx: jnp.ndarray,
                 batch_valid: jnp.ndarray, step_valid: jnp.ndarray,
                 lr: jnp.ndarray, rng: jax.Array,
                 vid_store, text_store, tables):
        from coot_videotext_tpu.data.device_store import (
            device_sample_batch, gather_dense_batch)

        def body(carry, xs):
            state = carry
            ids, bv, sv, key = xs
            k_sample, k_noise, k_drop, k_cc = jax.random.split(key, 4)
            batch = device_sample_batch(
                tables, ids, device_sampling["shapes"],
                device_sampling["max_frames"], rng=k_sample,
                batch_valid=bv)
            batch = gather_dense_batch(
                batch, vid_store, text_store, frames_noise=frames_noise,
                words_noise=words_noise, rng=k_noise)

            def loss_fn(params):
                out = model.apply({"params": params}, batch,
                                  deterministic=False,
                                  rngs={"dropout": k_drop})
                visual = {k: out[k] for k in
                          ("vid_emb", "clip_emb", "vid_context",
                           "clip_valid", "clip_num")}
                text = {k: out[k] for k in
                        ("par_emb", "sent_emb", "par_context",
                         "sent_valid", "sent_num")}
                loss, parts = compute_total_retrieval_loss(
                    visual, text, loss_weights, margin, loss_cycle_cons,
                    rng=k_cc, batch_valid=batch["batch_valid"])
                return loss, parts

            (_, parts), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            if clip_gradient > 0:
                grads, norm = clip_by_global_norm(grads, clip_gradient)
                parts = dict(parts, grad_norm=norm)
            new_params, new_opt = optimizer.update(
                grads, state.opt_state, state.params, lr)
            new_state = TrainState(new_params, new_opt, state.step + 1)
            # padded tail step: identity on the carried state
            new_state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(sv, a, b), new_state, state)
            parts = dict(parts, step_valid=sv)
            return new_state, parts

        keys = jax.random.split(rng, dp_idx.shape[0])
        state, metrics = jax.lax.scan(
            body, state, (dp_idx, batch_valid, step_valid, keys))
        return state, metrics

    if mesh is None:
        return jax.jit(group_fn, donate_argnums=(0,))
    rep = replicated_sharding(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P
    kdata = NamedSharding(mesh, P(None, "data"))
    state_sh = state_shardings if state_shardings is not None else rep
    return jax.jit(
        group_fn,
        in_shardings=(state_sh, kdata, kdata, rep, rep, rep, rep, rep,
                      rep),
        out_shardings=(state_sh, rep),
        donate_argnums=donate_argnums_for(mesh))
