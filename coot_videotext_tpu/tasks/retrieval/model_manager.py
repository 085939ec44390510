"""
Retrieval model manager: owns the flax modules + parameter lifecycle.

Counterpart of reference coot/model_retrieval.py:57 RetrievalModelManager +
nntrainer/models/model_manager_base.py:17. In JAX the "model" splits into a
stateless module (here) and a parameter pytree (owned by the trainer's
TrainState); this class builds the modules in the configured compute dtypes,
initializes parameters, and provides parameter counting.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from coot_videotext_tpu.models.retrieval import RetrievalModel


def dtype_from_name(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "float16": jnp.bfloat16}[name]


def build_dummy_retrieval_batch(cfg, batch_size: int = 2) -> Dict[str, Any]:
    """Tiny static batch for flax parameter init (shapes are free)."""
    dv = cfg.dataset_train.vid_feat_dim
    dt = cfg.dataset_train.text_feat_dim
    b, n, lv, lc, lp, ls = batch_size, 2, 8, 8, 8, 8
    z = np.zeros
    return {
        "batch_valid": np.ones(b, bool),
        "vid_feat": z((b, lv, dv), np.float32),
        "vid_mask": np.ones((b, lv), bool),
        "vid_len": np.full(b, lv, np.int32),
        "clip_feat": z((b, n, lc, dv), np.float32),
        "clip_mask": np.ones((b, n, lc), bool),
        "clip_len": np.full((b, n), lc, np.int32),
        "clip_valid": np.ones((b, n), bool),
        "clip_num": np.full(b, n, np.int32),
        "par_feat": z((b, lp, dt), np.float32),
        "par_mask": np.ones((b, lp), bool),
        "par_len": np.full(b, lp, np.int32),
        "sent_feat": z((b, n, ls, dt), np.float32),
        "sent_mask": np.ones((b, n, ls), bool),
        "sent_len": np.full((b, n), ls, np.int32),
        "sent_valid": np.ones((b, n), bool),
        "sent_num": np.full(b, n, np.int32),
    }


class RetrievalModelManager:
    """Builds the 4-network COOT model in train/eval compute dtypes."""

    def __init__(self, cfg) -> None:
        self.cfg = cfg
        train_dtype = dtype_from_name(cfg.compute_dtype)
        val_dtype = (jnp.bfloat16 if cfg.fp16_val else jnp.float32)
        self.model_train = RetrievalModel(model_cfgs=cfg.model_cfgs,
                                          dtype=train_dtype)
        if val_dtype == train_dtype:
            self.model_eval = self.model_train
        else:
            self.model_eval = RetrievalModel(model_cfgs=cfg.model_cfgs,
                                             dtype=val_dtype)
        self.was_loaded = False

    def init_params(self, seed: int, sample_batch=None):
        if sample_batch is None:
            sample_batch = build_dummy_retrieval_batch(self.cfg)
        rng = jax.random.PRNGKey(seed)
        variables = self.model_train.init(
            {"params": rng, "dropout": rng}, sample_batch,
            deterministic=True)
        return variables["params"]

    @staticmethod
    def count_parameters(params) -> int:
        return sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
