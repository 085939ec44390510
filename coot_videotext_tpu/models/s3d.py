"""
S3D-G HowTo100M video backbone in flax (TPU-native NDHWC layout).

Architecture parity with the inline PyTorch model in reference
extract_100m_features.py:195-520 (S3D :420): space-to-depth stem (the "3D
space to depth trick for TPU optimization" — native here), STConv3D with
separable spatial/temporal convs + BatchNorm(inference), TF-SAME max
pooling with ceil semantics, self-gating, the Inception 3b..5c tower, and
the 512-d video_embedding head. `load_torch_s3d_weights` maps the released
`s3d_howto100m.pth` checkpoint (OIDHW kernels) into this module's
parameters (DHWIO), so the published features are reproducible on TPU.

Inference-only (BatchNorm uses the checkpoint's running statistics); the
text branch (Sentence_Embedding) is host-side and ported in the extractor.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _triple(v) -> Tuple[int, int, int]:
    if isinstance(v, (list, tuple)):
        return tuple(v)
    return (v, v, v)


class BatchNormInference(nn.Module):
    """BatchNorm with stored statistics (torch BatchNorm3d.eval())."""
    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones,
                         (self.features,), jnp.float32)
        inv = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x * inv + (bias - mean * scale
                          / jnp.sqrt(var + self.eps)).astype(self.dtype)


class STConv3D(nn.Module):
    """Conv3d(+BN+relu), optionally separable (reference :273)."""
    output_dim: int
    kernel_size: Sequence[int]
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    separable: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = _triple(self.kernel_size)
        s = _triple(self.stride)
        p = _triple(self.padding)

        def conv(name, kern, strd, pad, features):
            padding = [(pp, pp) for pp in pad]
            return nn.Conv(features, kernel_size=tuple(kern),
                           strides=tuple(strd), padding=padding,
                           use_bias=False, dtype=self.dtype,
                           param_dtype=jnp.float32, name=name)

        if self.separable and k[0] != 1:
            x = conv("conv1", (1, k[1], k[2]), (1, s[1], s[2]),
                     (0, p[1], p[2]), self.output_dim)(x)
            x = BatchNormInference(self.output_dim, dtype=self.dtype,
                                   name="bn1")(x)
            x = nn.relu(x)
            x = conv("conv2", (k[0], 1, 1), (s[0], 1, 1),
                     (p[0], 0, 0), self.output_dim)(x)
            x = BatchNormInference(self.output_dim, dtype=self.dtype,
                                   name="bn2")(x)
            return nn.relu(x)
        x = conv("conv1", k, s, p, self.output_dim)(x)
        x = BatchNormInference(self.output_dim, dtype=self.dtype,
                               name="bn1")(x)
        return nn.relu(x)


def max_pool_3d_tf_padding(x: jnp.ndarray, kernel_size, stride
                           ) -> jnp.ndarray:
    """TF-SAME padding + ceil-mode 3D max pooling (reference :333)."""
    k = _triple(kernel_size)
    s = _triple(stride)
    pads = [(0, 0)]
    for kd, sd, size in zip(k, s, x.shape[1:4]):
        pad_along = max(kd - sd, 0)
        lo = pad_along // 2
        hi = pad_along - lo
        # ceil_mode: extend so the last window fits
        padded = size + lo + hi
        extra = (-(padded - kd)) % sd
        pads.append((lo, hi + extra))
    pads.append((0, 0))
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, pads, constant_values=neg)
    return jax.lax.reduce_window(
        xp, neg, jax.lax.max, (1,) + k + (1,), (1,) + s + (1,),
        "VALID")


class SelfGating(nn.Module):
    """S3D-G feature gating (reference :257)."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=(1, 2, 3))
        w = nn.Dense(self.features, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc")(avg)
        w = jax.nn.sigmoid(w)
        return w[:, None, None, None, :] * x


class InceptionBlock(nn.Module):
    """4-branch inception with per-branch gating (reference :204)."""
    n0: int
    n1a: int
    n1b: int
    n2a: int
    n2b: int
    n3b: int
    gating: bool = True
    dtype: Dtype = jnp.float32

    @property
    def output_dim(self) -> int:
        return self.n0 + self.n1b + self.n2b + self.n3b

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        b0 = STConv3D(self.n0, [1, 1, 1], dtype=dt, name="conv_b0")(x)
        b1 = STConv3D(self.n1a, [1, 1, 1], dtype=dt, name="conv_b1_a")(x)
        b1 = STConv3D(self.n1b, [3, 3, 3], padding=1, separable=True,
                      dtype=dt, name="conv_b1_b")(b1)
        b2 = STConv3D(self.n2a, [1, 1, 1], dtype=dt, name="conv_b2_a")(x)
        b2 = STConv3D(self.n2b, [3, 3, 3], padding=1, separable=True,
                      dtype=dt, name="conv_b2_b")(b2)
        b3 = jax.lax.reduce_window(
            jnp.pad(x, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)],
                    constant_values=jnp.asarray(-jnp.inf, x.dtype)),
            jnp.asarray(-jnp.inf, x.dtype), jax.lax.max,
            (1, 3, 3, 3, 1), (1, 1, 1, 1, 1), "VALID")
        b3 = STConv3D(self.n3b, [1, 1, 1], dtype=dt, name="conv_b3_b")(b3)
        if self.gating:
            b0 = SelfGating(self.n0, dt, name="gating_b0")(b0)
            b1 = SelfGating(self.n1b, dt, name="gating_b1")(b1)
            b2 = SelfGating(self.n2b, dt, name="gating_b2")(b2)
            b3 = SelfGating(self.n3b, dt, name="gating_b3")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class S3D(nn.Module):
    """S3D-G base (reference :420). Input NDHWC (B, T, H, W, 3) in
    [0, 1]; returns video_embedding / mixed_5c / before_mean."""
    num_classes: int = 512
    gating: bool = True
    space_to_depth: bool = True
    dtype: Dtype = jnp.float32

    @staticmethod
    def _space_to_depth(x):
        """(B, T, H, W, C) -> (B, T/2, H/2, W/2, 8C) matching the torch
        channel order (t, h, w, c) blocks (reference :482)."""
        b, t, h, w, c = x.shape
        x = x.reshape(b, t // 2, 2, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        return x.reshape(b, t // 2, h // 2, w // 2, 8 * c)

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        x = x.astype(dt)
        if self.space_to_depth:
            x = self._space_to_depth(x)
            net = STConv3D(64, [2, 4, 4], stride=1, padding=(1, 2, 2),
                           dtype=dt, name="conv1")(x)
            net = net[:, 1:, 1:, 1:]
        else:
            net = STConv3D(64, [3, 7, 7], stride=2, padding=(1, 3, 3),
                           dtype=dt, name="conv1")(x)
        net = max_pool_3d_tf_padding(net, (1, 3, 3), (1, 2, 2))
        net = STConv3D(64, [1, 1, 1], dtype=dt, name="conv_2b")(net)
        net = STConv3D(192, [3, 3, 3], padding=1, separable=True,
                       dtype=dt, name="conv_2c")(net)
        if self.gating:
            net = SelfGating(192, dt, name="gating")(net)
        net = max_pool_3d_tf_padding(net, (1, 3, 3), (1, 2, 2))
        net = InceptionBlock(64, 96, 128, 16, 32, 32, dtype=dt,
                             name="mixed_3b")(net)
        net = InceptionBlock(128, 128, 192, 32, 96, 64, dtype=dt,
                             name="mixed_3c")(net)
        net = max_pool_3d_tf_padding(net, (3, 3, 3), (2, 2, 2))
        net = InceptionBlock(192, 96, 208, 16, 48, 64, dtype=dt,
                             name="mixed_4b")(net)
        net = InceptionBlock(160, 112, 224, 24, 64, 64, dtype=dt,
                             name="mixed_4c")(net)
        net = InceptionBlock(128, 128, 256, 24, 64, 64, dtype=dt,
                             name="mixed_4d")(net)
        net = InceptionBlock(112, 144, 288, 32, 64, 64, dtype=dt,
                             name="mixed_4e")(net)
        net = InceptionBlock(256, 160, 320, 32, 128, 128, dtype=dt,
                             name="mixed_4f")(net)
        net = max_pool_3d_tf_padding(net, (2, 2, 2), (2, 2, 2))
        net = InceptionBlock(256, 160, 320, 32, 128, 128, dtype=dt,
                             name="mixed_5b")(net)
        net_all = InceptionBlock(384, 192, 384, 48, 128, 128, dtype=dt,
                                 name="mixed_5c")(net)
        pooled = jnp.mean(net_all, axis=(1, 2, 3))
        emb = nn.Dense(self.num_classes, dtype=dt,
                       param_dtype=jnp.float32, name="fc")(pooled)
        return {"video_embedding": emb, "mixed_5c": pooled,
                "before_mean": net_all}


# ---------- torch checkpoint conversion ----------

def _convert_conv(w: np.ndarray) -> np.ndarray:
    """torch OIDHW -> flax DHWIO."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def load_torch_s3d_weights(params, state_dict: Dict[str, "Any"]):
    """
    Pour the released s3d_howto100m.pth state dict into the flax params
    pytree. Handles conv kernels, BN (weight/bias/running stats), gating
    and fc linears. Text-branch weights are returned separately.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()
          if not k.startswith("text_module")}
    params = jax.tree_util.tree_map(np.asarray, params)

    def visit(tree, prefix):
        for name, sub in tree.items():
            path = f"{prefix}.{name}" if prefix else name
            if isinstance(sub, dict) and "kernel" in sub:
                if f"{path}.weight" in sd:
                    w = sd[f"{path}.weight"]
                    if w.ndim == 5:
                        sub["kernel"] = _convert_conv(w)
                    else:  # linear: torch (out, in) -> flax (in, out)
                        sub["kernel"] = w.T
                    if "bias" in sub and f"{path}.bias" in sd:
                        sub["bias"] = sd[f"{path}.bias"]
            elif isinstance(sub, dict) and "mean" in sub:
                # BatchNormInference
                sub["scale"] = sd[f"{path}.weight"]
                sub["bias"] = sd[f"{path}.bias"]
                sub["mean"] = sd[f"{path}.running_mean"]
                sub["var"] = sd[f"{path}.running_var"]
            elif isinstance(sub, dict):
                visit(sub, path)

    visit(params, "")
    return params
