"""
Basic model layers in flax.linen: activations, normalizations (including the
COOT layer-norm variant), MLP, sinusoidal positional encoding, learnable CLS
token, and weight initializers.

Numerical-parity notes vs the reference:
    - `layernorm_coot` (reference normalizations.py:84-101) normalizes by the
      Bessel-corrected std (ddof=1) and adds eps to the *std*, not the
      variance; it differs from standard LayerNorm and is used by every COOT
      config, so it is reproduced exactly here (in float32).
    - gelu is the exact erf-based form (torch's default), not the tanh
      approximation.
    - sincos positional encoding uses the reference's divisor variant
      `10000 ** (2 * dim_idx / dim)` (reference encoder.py:84-90).
    - truncnorm init resamples outside +-2 sigma; both weights AND biases are
      initialized this way while layer-norm gain/bias stay 1/0 (reference
      initialization.py:51-111).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from coot_videotext_tpu.models.configs import (
    ActivationConfig, ActivationConst, InitTypesConst, MLPConfig,
    NormalizationConfig, NormalizationConst, ResidualsEnum)

Dtype = Any
Initializer = Callable[..., jnp.ndarray]


# ---------- Dropout ----------

class Dropout(nn.Module):
    """
    Drop-in replacement for flax nn.Dropout (same auto-name, same rng
    collection, same keep/scale semantics), with the mask drawn by
    comparing raw uint16 random bits against a threshold instead of
    `jax.random.bernoulli`'s u32 -> f32 -> compare chain. The train step
    draws ~250M mask elements across ~10 sites; the RngBitGenerator HLO is
    output-bandwidth-bound, so halving the drawn bits nearly halves the
    cost (measured 0.21 ms vs 0.59 ms per 39M-element site on v5e, step
    10.5 -> 11.3k clips/s on the yc2 bench). Distribution: keep iff
    bits >= round(rate * 2^16), i.e. Bernoulli(1-rate) with the rate
    quantized to 1/65536 — exact for 2^-k rates, <0.06% relative off for
    the reference's 0.01/0.05 (the reference's own torch stream differs
    from any JAX stream; masks are not part of a parity contract).

    A Pallas hardware-PRNG dropout (ops/pallas_dropout.py) was also tried:
    2.8x cheaper standalone but SLOWER end-to-end (11.3k -> 7.9k) because
    the opaque kernel call breaks the elementwise fusions XLA otherwise
    sinks the mask into — kept for the record, not used.
    """
    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, *,
                 deterministic: Optional[bool] = None) -> jnp.ndarray:
        # match nn.Dropout: an unspecified deterministic is a loud error,
        # not silently-disabled dropout (raise, not assert: must survive -O)
        if deterministic is None:
            raise ValueError(
                "Dropout requires an explicit deterministic argument")
        if deterministic or self.rate == 0.0:
            return x
        if self.rate >= 1.0:
            return jnp.zeros_like(x)  # nn.Dropout semantics at rate 1
        key = self.make_rng("dropout")
        bits = jax.random.bits(key, x.shape, jnp.uint16)
        # clamp to [1, 65535]: a sub-quantum rate (< 2^-16) must still
        # drop with the closest representable probability, never silently
        # disable while scaling by 1/(1-rate)
        thresh = jnp.uint16(
            min(max(int(round(self.rate * 65536.0)), 1), 65535))
        return jnp.where(bits >= thresh, x / (1.0 - self.rate),
                         jnp.zeros_like(x))


# ---------- Initializers ----------

def make_initializer(init_type: str, init_std: float) -> Initializer:
    """
    Build a flax initializer from the reference init-type names
    (reference initialization.py:10-32).
    """
    if init_type == InitTypesConst.NONE:
        return nn.initializers.lecun_normal()
    if init_type == InitTypesConst.TRUNCNORM:
        # jax truncated_normal truncates at +-2 stddev, matching the
        # reference's resampling-based truncnorm fill (utils_torch.py:73-109)
        return nn.initializers.truncated_normal(stddev=init_std)
    if init_type == InitTypesConst.NORM:
        return nn.initializers.xavier_normal()
    if init_type == InitTypesConst.UNIFORM:
        return nn.initializers.xavier_uniform()
    raise ValueError(f"Unknown init type {init_type}")


def make_bias_initializer(init_type: str, init_std: float) -> Initializer:
    """
    Bias init. The reference initializes biases with the same distribution as
    weights when init is truncnorm (initialization.py:102-106); xavier on a 1-D
    bias is ill-defined there, so for non-truncnorm types we use zeros.
    """
    if init_type == InitTypesConst.TRUNCNORM:
        return nn.initializers.truncated_normal(stddev=init_std)
    return nn.initializers.zeros_init()


# ---------- Activations ----------

def make_activation(cfg: ActivationConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation factory (reference activations.py:13)."""
    name = cfg.name
    if name == ActivationConst.NONE:
        return lambda x: x
    if name == ActivationConst.RELU:
        return jax.nn.relu
    if name == ActivationConst.GELU:
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == ActivationConst.LEAKYRELU:
        slope = cfg.negative_slope
        return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)
    raise ValueError(f"Unknown activation {name}")


# ---------- Normalizations ----------

class CootLayerNorm(nn.Module):
    """
    COOT layer normalization: gain * (x - mean) / (std_bessel + eps) + bias
    (reference normalizations.py:84-101). Computed in float32 regardless of
    the module compute dtype — the (n-1) variance and eps-on-std make this
    sensitive to low precision.
    """
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        gain = self.param("gain", nn.initializers.ones_init(), (dim,),
                          jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (dim,),
                          jnp.float32)
        x32 = x.astype(jnp.float32)
        # Bessel-corrected std (torch `.std()` default, ddof=1), computed
        # from sum / sum-of-squares so XLA fuses BOTH statistics into one
        # multi-output reduction pass over x (the input norm runs over the
        # raw 4096-dim features — with the centered two-pass formulation
        # this layer was the single most expensive reduction in the train
        # step). The per-row shift by the first element keeps the single
        # pass (the subtract fuses into the reduction) while removing the
        # catastrophic cancellation of s2 - mean*s1 for rows whose
        # mean^2 >> var; stop_gradient on the shift leaves the exact
        # analytic gradient (the shift cancels in both mean and var).
        c = jax.lax.stop_gradient(x32[..., :1])
        xc = x32 - c
        s1 = jnp.sum(xc, axis=-1, keepdims=True)
        s2 = jnp.sum(jnp.square(xc), axis=-1, keepdims=True)
        mean_c = s1 / dim
        var = jnp.maximum(s2 - mean_c * s1, 0.0) / max(dim - 1, 1)
        mean = c + mean_c
        # double-where sqrt guard: d(sqrt)/d(var) is inf at var == 0, and
        # constant rows DO occur (zeroed padded clip/sentence slots feed the
        # global net's input norm) — the guarded branch keeps the forward
        # value identical (sqrt(0) == 0) while pinning the gradient of
        # those rows to 0 instead of 0 * inf = NaN.
        var_pos = var > 0.0
        std = jnp.where(var_pos, jnp.sqrt(jnp.where(var_pos, var, 1.0)), 0.0)
        out = gain * (x32 - mean) / (std + self.eps) + bias
        return out.astype(self.dtype)


class TorchLayerNorm(nn.Module):
    """Standard LayerNorm (reference `layernorm_pytorch`), fp32 internals."""
    eps: float = 1e-6
    affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones_init(), (dim,),
                               jnp.float32)
            bias = self.param("bias", nn.initializers.zeros_init(), (dim,),
                              jnp.float32)
            out = out * scale + bias
        return out.astype(self.dtype)


def make_normalization(cfg: Optional[NormalizationConfig], name: str,
                       dtype: Dtype = jnp.float32) -> Optional[nn.Module]:
    """Normalization factory (reference normalizations.py:15)."""
    if cfg is None:
        cfg = NormalizationConfig(name)
    if name == NormalizationConst.NONE:
        return None
    if name == NormalizationConst.LAYERNORM_COOT:
        return CootLayerNorm(eps=cfg.eps, dtype=dtype)
    if name == NormalizationConst.LAYERNORM_PYTORCH:
        return TorchLayerNorm(eps=cfg.eps, affine=cfg.affine, dtype=dtype)
    raise NotImplementedError(f"Normalization {name} not found.")


# ---------- Positional encoding ----------

def sincos_positional_encoding(max_len: int, dim: int) -> jnp.ndarray:
    """
    Reference-variant sinusoidal table (encoder.py:84-90):
        div = 10000 ** (2 * arange(dim) / dim)
        pe[:, 0::2] = sin(pos / div[0::2]); pe[:, 1::2] = cos(pos / div[1::2])
    """
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    dimension = jnp.arange(dim, dtype=jnp.float32)
    div_term = jnp.power(10000.0, 2.0 * dimension / dim)
    angles = position / div_term[None, :]
    pe_sin = jnp.sin(angles[:, 0::2])
    pe_cos = jnp.cos(angles[:, 1::2])
    pe = jnp.zeros((max_len, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(pe_sin)
    pe = pe.at[:, 1::2].set(pe_cos)
    return pe


class PositionalEncodingSinCos(nn.Module):
    """Additive sincos positional encoding (reference encoder.py:66)."""
    dim: int
    dropout: float = 0.0
    max_len: int = 1000
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *,
                 deterministic: bool = True) -> jnp.ndarray:
        pe = sincos_positional_encoding(self.max_len, self.dim)
        x = x + pe[None, : x.shape[1], :].astype(self.dtype)
        if self.dropout > 0:
            x = Dropout(rate=self.dropout)(x, deterministic=deterministic)
        return x


# ---------- MLP ----------

class MLP(nn.Module):
    """
    Configurable FC stack with optional residual (reference mlp.py:46-165):
    layer ordering, dropout and norm placement match the reference exactly.
    """
    cfg: MLPConfig
    init_type: str = InitTypesConst.TRUNCNORM
    init_std: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        kinit = make_initializer(self.init_type, self.init_std)
        binit = make_bias_initializer(self.init_type, self.init_std)
        dense = lambda feat, nm: nn.Dense(  # noqa: E731
            feat, kernel_init=kinit, bias_init=binit, dtype=self.dtype,
            param_dtype=jnp.float32, name=nm)
        act_middle = make_activation(cfg.activation_middle)
        inp = x
        assert cfg.num_layers > 0, "MLP with 0 layers"
        if cfg.num_layers == 1:
            x = dense(cfg.output_dim, "fc_0")(x)
            if cfg.dropout_output > 0:
                x = Dropout(rate=cfg.dropout_output)(
                    x, deterministic=deterministic)
        else:
            x = dense(cfg.hidden_dim, "fc_0")(x)
            if cfg.dropout_middle > 0:
                x = Dropout(rate=cfg.dropout_middle)(
                    x, deterministic=deterministic)
            norm_mid = make_normalization(cfg.norm_middle,
                                          cfg.norm_middle.name, self.dtype)
            if norm_mid is not None:
                x = norm_mid(x)
            for n in range(1, cfg.num_layers - 1):
                if cfg.activation_middle.name != ActivationConst.NONE:
                    x = act_middle(x)
                x = dense(cfg.hidden_dim, f"fc_{n}")(x)
                if cfg.dropout_middle > 0:
                    x = Dropout(rate=cfg.dropout_middle)(
                        x, deterministic=deterministic)
                norm_mid_n = make_normalization(
                    cfg.norm_middle, cfg.norm_middle.name, self.dtype)
                if norm_mid_n is not None:
                    x = norm_mid_n(x)
            if cfg.activation_middle.name != ActivationConst.NONE:
                x = act_middle(x)
            x = dense(cfg.output_dim, f"fc_{cfg.num_layers - 1}")(x)
            if cfg.dropout_output > 0:
                x = Dropout(rate=cfg.dropout_output)(
                    x, deterministic=deterministic)

        if cfg.residual == ResidualsEnum.PASSTHROUGH:
            x = x + inp
        elif cfg.residual == ResidualsEnum.LINEAR:
            x = x + dense(cfg.output_dim, "residual_fc")(inp)
        elif cfg.residual != ResidualsEnum.NONE:
            raise ValueError(f"Unknown residual {cfg.residual}")

        if cfg.activation_output.name != ActivationConst.NONE:
            x = make_activation(cfg.activation_output)(x)
        norm_out = make_normalization(cfg.norm_output, cfg.norm_output.name,
                                      self.dtype)
        if norm_out is not None:
            x = norm_out(x)
        return x


# ---------- CLS token ----------

class LearnableClsToken(nn.Module):
    """
    Prepend a learnable CLS token to the sequence; extends the valid mask and
    lengths accordingly (reference transformer_legacy.py:291). Mask convention
    here: True = valid token.
    """
    d_model: int
    init_type: str = InitTypesConst.TRUNCNORM
    init_std: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray, mask: jnp.ndarray,
                 lengths: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cls = self.param(
            "cls_token", make_initializer(self.init_type, self.init_std),
            (self.d_model,), jnp.float32).astype(self.dtype)
        batch = features.shape[0]
        cls_tok = jnp.broadcast_to(cls[None, None, :],
                                   (batch, 1, self.d_model))
        features = jnp.concatenate([cls_tok, features], axis=1)
        valid = jnp.ones((batch, 1), mask.dtype)
        mask = jnp.concatenate([valid, mask], axis=1)
        return features, mask, lengths + 1
