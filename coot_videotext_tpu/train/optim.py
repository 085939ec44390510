"""
Optimizers as jit-friendly pure functions: RAdam (the optimizer used by all
retrieval configs), Adam, BertAdam (MART), and EMA.

API: each optimizer is an `Optimizer(init, update)` pair where
`update(grads, state, params, lr)` takes the CURRENT learning rate as a traced
scalar — the reduce-on-plateau scheduler lives on host and simply feeds a new
lr into the jit'd train step (no recompilation).

Numerical parity:
    - RAdam matches reference nntrainer/optimization.py:79-183: rectification
      term N_sma with the >=5 threshold, step size incl. 1/(1-beta1^t),
      denom = sqrt(v) + eps (no bias correction on v outside the step-size
      term), decoupled weight decay p -= wd * lr * p applied only when an
      update happens, optional degenerate-to-SGD branch.
    - The bias decay rule matches model_manager_base.py:146-153: when
      `weight_decay_for_bias` is TRUE, params whose name contains 'bias' get
      decay_mult = 0 (the reference flag reads inverted; behavior reproduced).
    - BertAdam matches mart/optimization.py:250-383: Adam WITHOUT bias
      correction, per-parameter grad-norm clip inside the step, weight decay
      added to the update, schedule applied by the caller.
    - EMA matches mart/optimization.py:201-248: shadow update with decay ramp
      min(decay, (1+step)/(10+step)).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from coot_videotext_tpu.config.base import OptimizerConfig, OptimizerConst

PyTree = Any


class Optimizer(NamedTuple):
    init: Callable[[PyTree], PyTree]
    # update(grads, state, params, lr) -> (new_params, new_state)
    update: Callable[[PyTree, PyTree, PyTree, jnp.ndarray],
                     Tuple[PyTree, PyTree]]


class AdamState(NamedTuple):
    step: jnp.ndarray
    mu: PyTree
    nu: PyTree


def _decay_mask(params: PyTree, weight_decay_for_bias: bool) -> PyTree:
    """
    Per-leaf decay multiplier. Reference model_manager_base.py:146-153 sets
    decay_mult=0 for 'bias'-named params IFF weight_decay_for_bias is true.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    mults = []
    for path, _leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        is_bias = "bias" in name
        mults.append(0.0 if (weight_decay_for_bias and is_bias) else 1.0)
    return jax.tree_util.tree_unflatten(treedef, mults)


def make_radam(beta1: float, beta2: float, eps: float, weight_decay: float,
               degenerated_to_sgd: bool = False,
               weight_decay_for_bias: bool = True) -> Optimizer:
    """RAdam (reference optimization.py:79)."""

    def init(params: PyTree) -> AdamState:
        zeros = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                         nu=jax.tree.map(jnp.copy, zeros))

    def update(grads: PyTree, state: AdamState, params: PyTree,
               lr: jnp.ndarray) -> Tuple[PyTree, AdamState]:
        step = state.step + 1
        t = step.astype(jnp.float32)
        mu = jax.tree.map(
            lambda m, g: beta1 * m + (1 - beta1) * g.astype(jnp.float32),
            state.mu, grads)
        nu = jax.tree.map(
            lambda v, g: beta2 * v
            + (1 - beta2) * jnp.square(g.astype(jnp.float32)),
            state.nu, grads)

        beta2_t = jnp.power(beta2, t)
        n_sma_max = 2.0 / (1.0 - beta2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1.0 - beta2_t)
        bias1 = 1.0 - jnp.power(beta1, t)
        rect = jnp.sqrt(
            (1.0 - beta2_t) * (n_sma - 4.0) / (n_sma_max - 4.0)
            * (n_sma - 2.0) / n_sma * n_sma_max / (n_sma_max - 2.0))
        # guard: rect is nan for n_sma <= 4 but is only selected when >= 5
        rect = jnp.where(n_sma >= 5.0, rect, 0.0)
        step_size_adam = rect / bias1
        step_size_sgd = 1.0 / bias1

        use_adam = n_sma >= 5.0
        do_update = jnp.logical_or(use_adam, degenerated_to_sgd)
        dmask = _decay_mask(params, weight_decay_for_bias)

        def upd(p, m, v, dm):
            p32 = p.astype(jnp.float32)
            wd_term = weight_decay * dm * lr * p32
            adam_step = step_size_adam * lr * m / (jnp.sqrt(v) + eps)
            sgd_step = step_size_sgd * lr * m
            delta = jnp.where(use_adam, adam_step + wd_term,
                              sgd_step + wd_term)
            new_p = jnp.where(do_update, p32 - delta, p32)
            return new_p.astype(p.dtype)

        new_params = jax.tree.map(upd, params, mu, nu, dmask)
        return new_params, AdamState(step=step, mu=mu, nu=nu)

    return Optimizer(init=init, update=update)


def make_adam(beta1: float, beta2: float, eps: float, weight_decay: float,
              weight_decay_for_bias: bool = True) -> Optimizer:
    """Standard Adam with bias correction and L2 (torch-style) decay."""

    def init(params: PyTree) -> AdamState:
        zeros = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                         nu=jax.tree.map(jnp.copy, zeros))

    def update(grads, state, params, lr):
        step = state.step + 1
        t = step.astype(jnp.float32)
        dmask = _decay_mask(params, weight_decay_for_bias)
        # torch Adam couples weight decay into the gradient
        grads = jax.tree.map(
            lambda g, p, dm: g.astype(jnp.float32)
            + weight_decay * dm * p.astype(jnp.float32),
            grads, params, dmask)
        mu = jax.tree.map(lambda m, g: beta1 * m + (1 - beta1) * g,
                          state.mu, grads)
        nu = jax.tree.map(lambda v, g: beta2 * v + (1 - beta2) * jnp.square(g),
                          state.nu, grads)
        bias1 = 1.0 - jnp.power(beta1, t)
        bias2 = 1.0 - jnp.power(beta2, t)

        def upd(p, m, v):
            p32 = p.astype(jnp.float32)
            denom = jnp.sqrt(v / bias2) + eps
            return (p32 - lr * (m / bias1) / denom).astype(p.dtype)

        new_params = jax.tree.map(upd, params, mu, nu)
        return new_params, AdamState(step=step, mu=mu, nu=nu)

    return Optimizer(init=init, update=update)


def make_optimizer(cfg: OptimizerConfig) -> Optimizer:
    """Optimizer factory (reference optimization.py:45)."""
    if cfg.name == OptimizerConst.RADAM:
        return make_radam(cfg.momentum, cfg.adam_beta2, cfg.adam_eps,
                          cfg.weight_decay, cfg.radam_degentosgd,
                          cfg.weight_decay_for_bias)
    if cfg.name == OptimizerConst.ADAM:
        return make_adam(cfg.momentum, cfg.adam_beta2, cfg.adam_eps,
                         cfg.weight_decay, cfg.weight_decay_for_bias)
    raise NotImplementedError(f"Unknown optimizer {cfg.name}")


# ---------- BertAdam (MART) ----------

class BertAdamState(NamedTuple):
    step: jnp.ndarray
    mu: PyTree
    nu: PyTree


def make_bertadam(beta1: float = 0.9, beta2: float = 0.999,
                  eps: float = 1e-6, weight_decay: float = 0.01,
                  max_grad_norm: float = 1.0,
                  no_decay_names: Tuple[str, ...] = ("bias", "scale",
                                                     "gain"),
                  frozen_names: Tuple[str, ...] = ()
                  ) -> Optimizer:
    """
    BertAdam (reference mart/optimization.py:250): NO bias correction,
    per-parameter grad-norm clipping inside the step (:351-352), decay added
    to the update (:368-369). The lr passed to update() must already include
    the warmup schedule (the reference bakes the schedule into get_lr).

    no_decay_names: param name substrings exempt from decay (the MART trainer
    exempts bias and LayerNorm params, trainer_caption.py:190-195; flax
    layer-norm params here are named scale/gain/bias).
    frozen_names: param name substrings that receive NO update — used for
    freeze_glove (reference model.py:79-85 freezes the pretrained word
    embedding via requires_grad).
    """

    def init(params: PyTree) -> BertAdamState:
        zeros = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        return BertAdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                             nu=jax.tree.map(jnp.copy, zeros))

    def _name_mask(params, names):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        treedef = jax.tree_util.tree_structure(params)
        mults = []
        for path, _leaf in flat:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            mults.append(0.0 if any(nd in name for nd in names) else 1.0)
        return jax.tree_util.tree_unflatten(treedef, mults)

    def update(grads, state, params, lr):
        step = state.step + 1
        dmask = _name_mask(params, no_decay_names)
        fmask = (_name_mask(params, frozen_names) if frozen_names
                 else jax.tree.map(lambda p: 1.0, params))

        def clip(g):
            g = g.astype(jnp.float32)
            if max_grad_norm <= 0:
                return g
            norm = jnp.linalg.norm(g.reshape(-1))
            scale = jnp.minimum(1.0, max_grad_norm / (norm + 1e-6))
            return g * scale

        grads = jax.tree.map(clip, grads)
        mu = jax.tree.map(lambda m, g: beta1 * m + (1 - beta1) * g,
                          state.mu, grads)
        nu = jax.tree.map(lambda v, g: beta2 * v + (1 - beta2) * jnp.square(g),
                          state.nu, grads)

        def upd(p, m, v, dm, fm):
            p32 = p.astype(jnp.float32)
            upd_val = m / (jnp.sqrt(v) + eps) + weight_decay * dm * p32
            return (p32 - lr * fm * upd_val).astype(p.dtype)

        new_params = jax.tree.map(upd, params, mu, nu, dmask, fmask)
        return new_params, BertAdamState(step=step, mu=mu, nu=nu)

    return Optimizer(init=init, update=update)


def warmup_linear(progress: jnp.ndarray, warmup: float) -> jnp.ndarray:
    """
    BertAdam warmup_linear schedule factor (reference mart/optimization.py
    :100-130): ramp 0->1 during `warmup` fraction, then linear decay to 0.
    """
    ramp = progress / jnp.maximum(warmup, 1e-9)
    decay = jnp.maximum((progress - 1.0) / (warmup - 1.0), 0.0)
    return jnp.where(progress < warmup, ramp, decay)


# ---------- EMA ----------

class EMAState(NamedTuple):
    shadow: PyTree


def ema_init(params: PyTree) -> EMAState:
    # copy=True is load-bearing: astype(f32) on an already-f32 param is a
    # no-op returning the SAME buffer, so the train state would hold each
    # param buffer twice (params leaf + shadow leaf) — donating such a
    # state (donate_argnums on the train step) then fails at runtime on
    # TPU with INVALID_ARGUMENT (duplicate donated buffers).
    return EMAState(shadow=jax.tree.map(
        lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params))


def ema_update(state: EMAState, params: PyTree, decay: float,
               step: jnp.ndarray) -> EMAState:
    """Shadow update with ramp min(decay, (1+t)/(10+t)) (reference :219)."""
    t = step.astype(jnp.float32)
    d = jnp.minimum(decay, (1.0 + t) / (10.0 + t))
    shadow = jax.tree.map(
        lambda s, p: (1.0 - d) * p.astype(jnp.float32) + d * s,
        state.shadow, params)
    return EMAState(shadow=shadow)


# ---------- Gradient utilities ----------

def global_norm(tree: PyTree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                        for l in leaves))


def clip_by_global_norm(grads: PyTree, max_norm: float
                        ) -> Tuple[PyTree, jnp.ndarray]:
    """torch clip_grad_norm_ parity; returns (clipped, pre-clip norm)."""
    norm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), norm
