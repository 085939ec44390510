"""
The COOT building block: one configurable transformer network
(input FC -> positional encoding -> self-attention -> optional cross-attention
with a global context query -> pooling), instantiated four times by the
retrieval model.

Pipeline parity with reference transformer_legacy.py:115-288 (forward :200):
input dropout -> input norm -> input FC -> optional CLS token -> sincos PE ->
self-attn encoder -> optional cross-attn (context vector as query, sequence as
key/value; result concatenated to the pooled output) -> pooler -> optional
output FC -> optional linear_out. Returns (pooled, seq_features).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from coot_videotext_tpu.models.attention import (
    TransformerDecoder, TransformerEncoder)
from coot_videotext_tpu.models.configs import (
    ActivationConst, NormalizationConst, PositionalEncodingConst,
    ResidualsEnum, TransformerConfig, TransformerTypesConst)
from coot_videotext_tpu.models.layers import (Dropout, MLP, LearnableClsToken, PositionalEncodingSinCos, make_bias_initializer,
    make_initializer, make_normalization)
from coot_videotext_tpu.models.poolers import make_pooler

Dtype = Any


class _CootNormParams(nn.Module):
    """Parameter-only stand-in for CootLayerNorm: declares the same
    (gain, bias) leaves under the same tree path (pass name=
    "CootLayerNorm_0") so the fused input-projection path keeps the
    parameter pytree, checkpoints and torch-converter mappings identical
    to the unfused path."""
    dim: int

    @nn.compact
    def __call__(self):
        gain = self.param("gain", nn.initializers.ones_init(),
                          (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.dim,), jnp.float32)
        return gain, bias


class _DenseParams(nn.Module):
    """Parameter-only stand-in for one nn.Dense (kernel, bias)."""
    din: int
    dout: int
    init_type: str
    init_std: float

    @nn.compact
    def __call__(self):
        kinit = make_initializer(self.init_type, self.init_std)
        binit = make_bias_initializer(self.init_type, self.init_std)
        w = self.param("kernel", kinit, (self.din, self.dout), jnp.float32)
        b = self.param("bias", binit, (self.dout,), jnp.float32)
        return w, b


class _InputFCParams(nn.Module):
    """Parameter-only stand-in for the single-layer input MLP: declares
    fc_0/{kernel,bias} under this module's name ("input_fc")."""
    din: int
    dout: int
    init_type: str
    init_std: float

    @nn.compact
    def __call__(self):
        return _DenseParams(din=self.din, dout=self.dout,
                            init_type=self.init_type,
                            init_std=self.init_std, name="fc_0")()


class CootTransformer(nn.Module):
    """One COOT network (reference TransformerLegacy).

    input_is_data: promise that the features passed to __call__ are
    NON-differentiable pipeline data (no gradient ever flows into them).
    Only then may the fused input-projection kernel engage — its VJP
    returns a zero input cotangent (ops/pallas_input_fc.py). The
    retrieval model sets this for its LOCAL nets only; the global nets
    consume differentiable local-net outputs and must keep the default.
    """
    cfg: TransformerConfig
    max_len: int = 1024
    dtype: Dtype = jnp.float32
    input_is_data: bool = False

    @property
    def output_dim(self) -> int:
        """Pooled output dim incl. cross-attn concat (reference :186-198)."""
        out = self.cfg.output_dim
        if self.cfg.use_context:
            out += self.cfg.crossatn.hidden_dim
        return out

    def _fused_input_act(self, din: int) -> Optional[str]:
        """Return "gelu"/"none" when the input norm+FC can take the fused
        pallas kernel (ops/pallas_input_fc.py), else None. Conditions: TPU
        backend, layernorm_coot input norm, no input dropout, single-layer
        FC with no dropout/residual/output-norm and gelu/none activation —
        i.e. exactly the shape of every shipped retrieval config's input
        projection — AND the caller's input_is_data promise (the kernel's
        VJP returns a zero input cotangent, which is only sound when the
        input is pipeline data, never a differentiable activation)."""
        from coot_videotext_tpu.ops.pallas_input_fc import (
            fused_input_fc_available)
        cfg = self.cfg
        if not self.input_is_data:
            return None
        if (cfg.norm_input != NormalizationConst.LAYERNORM_COOT
                or not cfg.use_input_fc or cfg.dropout_input > 0):
            return None
        fc = cfg.input_fc_config
        if (fc.num_layers != 1 or fc.dropout_output > 0
                or fc.residual != ResidualsEnum.NONE
                or fc.norm_output.name != NormalizationConst.NONE
                or fc.activation_output.name not in
                (ActivationConst.GELU, ActivationConst.NONE)):
            return None
        itemsize = jnp.dtype(self.dtype).itemsize
        if not fused_input_fc_available(din, fc.output_dim, itemsize):
            return None
        return ("gelu" if fc.activation_output.name == ActivationConst.GELU
                else "none")

    @nn.compact
    def __call__(self, features: jnp.ndarray, mask: jnp.ndarray,
                 lengths: jnp.ndarray,
                 hidden_state: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """
        Args:
            features: (B, L, D_in)
            mask: validity mask (B, L); True = real token
            lengths: (B,)
            hidden_state: optional context vector (B, D_ctx) for cross-attn

        Returns:
            (pooled (B, output_dim), seq_features (B, L[+1], hidden))
        """
        cfg = self.cfg
        assert cfg.name == TransformerTypesConst.TRANSFORMER_LEGACY, (
            f"Unsupported network type {cfg.name}")
        init_type, init_std = cfg.weight_init_type, cfg.weight_init_std

        x = features.astype(self.dtype)
        fused_act = self._fused_input_act(x.shape[-1])
        if fused_act is not None and (x.shape[0] * x.shape[1]) % 32:
            fused_act = None  # row count must tile into >=32-row blocks
        if fused_act is not None:
            # fused CootLayerNorm -> Dense -> (gelu) pallas kernel over the
            # raw input rows (ops/pallas_input_fc.py) — one HBM pass instead
            # of the norm/matmul/residual round-trips. Only taken at the
            # input projection, where the features come from the data
            # pipeline and are never differentiated (the kernel returns a
            # zero input cotangent). Param tree identical to the unfused
            # path via the parameter-only stand-in modules.
            from coot_videotext_tpu.ops.pallas_input_fc import fused_input_fc
            fc = cfg.input_fc_config
            din = x.shape[-1]
            gain, nbias = _CootNormParams(dim=din,
                                          name="CootLayerNorm_0")()
            w, b = _InputFCParams(din=din, dout=fc.output_dim,
                                  init_type=init_type, init_std=init_std,
                                  name="input_fc")()
            bsz, seq, _ = x.shape
            # make the input_is_data promise explicit in the graph: the
            # kernel's VJP returns a zero input cotangent, so declare the
            # input non-differentiable here rather than rely on the
            # kernel silently zeroing a future caller's gradient
            x = jax.lax.stop_gradient(x)
            x = fused_input_fc(x.reshape(bsz * seq, din), gain, nbias,
                               w, b, 1e-6, fused_act)
            x = x.reshape(bsz, seq, fc.output_dim)
        else:
            if cfg.dropout_input > 0:
                x = Dropout(rate=cfg.dropout_input)(
                    x, deterministic=deterministic)
            norm_in = make_normalization(None, cfg.norm_input, self.dtype)
            if norm_in is not None:
                x = norm_in(x)
            if cfg.use_input_fc:
                x = MLP(cfg=cfg.input_fc_config, init_type=init_type,
                        init_std=init_std, dtype=self.dtype,
                        name="input_fc")(x, deterministic=deterministic)

        if cfg.add_local_cls_token:
            x, mask, lengths = LearnableClsToken(
                d_model=cfg.selfatn.hidden_dim,
                init_type=cfg.local_cls_token_init_type,
                init_std=cfg.local_cls_token_init_std, dtype=self.dtype,
                name="cls_token")(x, mask, lengths)

        if cfg.positional_encoding == PositionalEncodingConst.SINCOS:
            x = PositionalEncodingSinCos(
                dim=cfg.selfatn.hidden_dim, dropout=cfg.dropout_input,
                max_len=self.max_len, dtype=self.dtype,
                name="embedding")(x, deterministic=deterministic)
        elif cfg.positional_encoding != PositionalEncodingConst.NONE:
            raise ValueError(
                f"Unknown positional encoding {cfg.positional_encoding}")

        x = TransformerEncoder(
            cfg=cfg.selfatn, init_type=init_type, init_std=init_std,
            dtype=self.dtype, name="tf")(
                x, mask, deterministic=deterministic)

        add_after_pool = None
        if cfg.use_context:
            assert hidden_state is not None, (
                "use_context network needs a hidden_state query")
            query = hidden_state.astype(self.dtype)[:, None, :]
            ctx = TransformerDecoder(
                cfg=cfg.crossatn, init_type=init_type, init_std=init_std,
                dtype=self.dtype, name="tf_context")(
                    query, x, mask, deterministic=deterministic)
            add_after_pool = ctx[:, 0]

        pooled = make_pooler(cfg.pooler_config, cfg.selfatn.hidden_dim,
                             init_type, init_std, self.dtype,
                             name="pooler")(
                                 x, mask, lengths,
                                 deterministic=deterministic)

        if add_after_pool is not None:
            pooled = jnp.concatenate([pooled, add_after_pool], axis=-1)

        if cfg.use_output_fc:
            pooled = MLP(cfg=cfg.output_fc_config, init_type=init_type,
                         init_std=init_std, dtype=self.dtype,
                         name="output_fc")(pooled,
                                           deterministic=deterministic)
        if cfg.linear_out:
            kinit = make_initializer(init_type, init_std)
            binit = make_bias_initializer(init_type, init_std)
            pooled = nn.Dense(pooled.shape[-1], kernel_init=kinit,
                              bias_init=binit, dtype=self.dtype,
                              param_dtype=jnp.float32,
                              name="linear_out")(pooled)
        return pooled, x
