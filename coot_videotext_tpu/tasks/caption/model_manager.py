"""
Caption model factory + manager.

Port of reference mart/model.py:45 create_mart_model and
mart/trainer_caption.py:89 MartModelManager: dispatches to the model family
by config flags, optionally loads GloVe word-embedding vectors from the
cache (reference :79-85), and owns parameter init in the configured
compute dtype.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from coot_videotext_tpu.models.caption.mart import (
    NonRecurTransformer, RecursiveTransformer)


def load_glove_matrix(cache_dir: str, dataset_name: str) -> np.ndarray:
    """Load `<dset>_vocab_glove.pt` (a torch-saved float array).

    The reference's released cache is a legacy numpy pickle; rather than
    full pickle deserialization (arbitrary code execution if the asset is
    ever swapped) only the exact numpy constructors it needs are
    allowlisted under weights_only=True. The pickled module path is the
    pre-numpy-2 "numpy.core.…", so the callable is registered under that
    historical name explicitly.
    """
    import torch
    path = Path(cache_dir) / f"{dataset_name}_vocab_glove.pt"
    try:
        from numpy._core import multiarray as _multiarray
    except ImportError:  # numpy < 2
        from numpy.core import multiarray as _multiarray
    safe = [(_multiarray._reconstruct, "numpy.core.multiarray._reconstruct"),
            np.ndarray, np.dtype]
    try:
        from numpy import dtypes as _np_dtypes
        safe += [_np_dtypes.Float32DType, _np_dtypes.Float64DType]
    except ImportError:
        pass
    with torch.serialization.safe_globals(safe):
        arr = torch.load(str(path), map_location="cpu", weights_only=True)
    if hasattr(arr, "numpy"):
        arr = arr.numpy()
    return np.asarray(arr, np.float32)


def create_mart_model(cfg, vocab_size: int, *,
                      cache_dir: str = "cache_caption",
                      dataset_name: Optional[str] = None,
                      compute_dtype=None, verbose: bool = True):
    """Build the flax caption model for this config (reference :45).

    compute_dtype=None resolves from cfg.compute_dtype (fp16_train: true
    => bfloat16 — safe on TPU, unlike the reference's fp16 MART which
    NaNs in torch backward; all loss/softmax/layernorm internals stay
    f32 regardless)."""
    if compute_dtype is None:
        name = getattr(cfg, "compute_dtype", "float32")
        compute_dtype = {"float32": jnp.float32,
                         "bfloat16": jnp.bfloat16,
                         "float16": jnp.bfloat16}[name]
    cfg.max_position_embeddings = cfg.max_v_len + cfg.max_t_len
    cfg.vocab_size = vocab_size
    if cfg.recurrent:
        if cfg.xl:
            from coot_videotext_tpu.models.caption.xl import TransformerXL
            model = TransformerXL(cfg, compute_dtype)
        else:
            model = RecursiveTransformer(cfg, compute_dtype)
    else:
        if cfg.untied:
            from coot_videotext_tpu.models.caption.untied import (
                NonRecurTransformerUntied)
            model = NonRecurTransformerUntied(cfg, compute_dtype)
        elif cfg.mtrans:
            from coot_videotext_tpu.models.caption.mtransformer import (
                MTransformer)
            model = MTransformer(cfg, compute_dtype)
        else:
            model = NonRecurTransformer(cfg, compute_dtype)
    return model


class MartModelManager:
    """Owns the flax module + parameter lifecycle for one caption model."""

    def __init__(self, cfg, model) -> None:
        self.cfg = cfg
        self.model = model
        self.was_loaded = False

    def init_params(self, seed: int, sample_batch: Dict[str, Any]):
        rng = jax.random.PRNGKey(seed)
        variables = self.model.init(
            {"params": rng, "dropout": rng},
            sample_batch["input_ids"], sample_batch["video_feature"],
            sample_batch["input_mask"], sample_batch["token_type_ids"],
            sample_batch["input_labels"], deterministic=True)
        params = variables["params"]
        if self.cfg.use_glove:
            params = self.apply_glove(params)
        return params

    def apply_glove(self, params):
        """Replace word embeddings with GloVe vectors (reference :79-85).
        freeze_glove is handled by the optimizer mask."""
        try:
            glove = load_glove_matrix("cache_caption",
                                      self.cfg.dataset_train.name)
        except (FileNotFoundError, OSError):
            return params  # cache not present; keep random init
        emb = params["embeddings"]["word_embeddings"]["embedding"]
        if glove.shape != emb.shape:
            return params
        params = jax.tree_util.tree_map(lambda x: x, params)  # copy
        params["embeddings"]["word_embeddings"]["embedding"] = \
            jnp.asarray(glove)
        return params

    @staticmethod
    def count_parameters(params) -> int:
        return sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))


def build_dummy_caption_batch(cfg, vocab_size: int, batch_size: int = 2,
                              step_size: int = 2) -> Dict[str, Any]:
    """Tiny stacked batch for parameter init."""
    s, n = step_size, batch_size
    length = cfg.max_v_len + cfg.max_t_len
    rng = np.random.RandomState(0)
    return {
        "input_ids": rng.randint(0, vocab_size, (s, n, length)).astype(
            np.int32),
        "input_labels": np.full((s, n, length), -1, np.int32),
        "input_mask": np.ones((s, n, length), np.float32),
        "token_type_ids": np.concatenate(
            [np.zeros((s, n, cfg.max_v_len), np.int32),
             np.ones((s, n, cfg.max_t_len), np.int32)], axis=-1),
        "video_feature": rng.randn(
            s, n, length, cfg.video_feature_size).astype(np.float32),
    }


def build_dummy_caption_batch_single(cfg, vocab_size: int,
                                     batch_size: int = 2,
                                     untied: bool = False
                                     ) -> Dict[str, Any]:
    """Tiny single-sentence batch (untied or joint layout) for init."""
    n = batch_size
    rng = np.random.RandomState(0)
    if untied:
        return {
            "video_feature": rng.randn(
                n, cfg.max_v_len, cfg.video_feature_size).astype(
                np.float32),
            "video_mask": np.ones((n, cfg.max_v_len), np.float32),
            "text_ids": rng.randint(0, vocab_size,
                                    (n, cfg.max_t_len)).astype(np.int32),
            "text_mask": np.ones((n, cfg.max_t_len), np.float32),
            "text_labels": np.full((n, cfg.max_t_len), -1, np.int64),
        }
    length = cfg.max_v_len + cfg.max_t_len
    return {
        "input_ids": rng.randint(0, vocab_size, (n, length)).astype(
            np.int32),
        "input_labels": np.full((n, length), -1, np.int64),
        "input_mask": np.ones((n, length), np.float32),
        "token_type_ids": np.concatenate(
            [np.zeros((n, cfg.max_v_len), np.int32),
             np.ones((n, cfg.max_t_len), np.int32)], axis=-1),
        "video_feature": rng.randn(
            n, length, cfg.video_feature_size).astype(np.float32),
    }
