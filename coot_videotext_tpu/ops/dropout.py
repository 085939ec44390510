"""
Rematerializing dropout: regenerate the keep mask in the backward pass
instead of storing it.

MEASURED NEGATIVE RESULT (kept for the record, like ops/pallas_gather.py):
on the bench.py yc2 workload, dropout costs ~20% of the fused train step
(10.5k clips/s with p=0.01 vs 12.8k with dropout off), and the profiler
shows the attention-probs masks being generated, compared and copied as
fwd->bwd residuals (~160 MB u32 per step). The hypothesis was that storing
only the PRNG key and regenerating the mask in backward would win the HBM
round-trip back. It does not, on v5e:
  - without an optimization barrier, XLA CSEs the backward bernoulli with
    the forward one (identical pure expression) and stores the bits anyway
    — measured 10.2k clips/s, i.e. parity with plain nn.Dropout;
  - with jax.lax.optimization_barrier on the key (forcing true
    regeneration), the extra rng-bit-generator work costs MORE than the
    residual traffic it saves — measured 9.5k clips/s.
The production models therefore use plain `flax.linen.Dropout`; this
module remains as the rematerialized-dropout reference pattern for
workloads where masks are large relative to rng throughput (e.g. long-
sequence attention where the (L, L) mask dwarfs the row compute).

Semantics match `flax.linen.Dropout` (inverted dropout, scale 1/(1-rate)
at train time); the drawn bits differ from flax's only in how the key is
consumed — dropout masks are not part of any parity contract.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn


def _keep_mult(key: jax.Array, rate: float, shape, dtype) -> jnp.ndarray:
    keep = jax.random.bernoulli(key, 1.0 - rate, shape)
    return jnp.where(keep, jnp.asarray(1.0 / (1.0 - rate), dtype),
                     jnp.asarray(0.0, dtype))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def dropout_remat(x: jnp.ndarray, key: jax.Array, rate: float) -> jnp.ndarray:
    return x * _keep_mult(key, rate, x.shape, x.dtype)


def _dropout_fwd(x, key, rate):
    return dropout_remat(x, key, rate), key


def _dropout_bwd(rate, key, g):
    # optimization_barrier: without it XLA CSEs this bernoulli with the
    # forward one (identical pure expression) and stores the mask bits
    # across the whole fwd->bwd gap — exactly the materialization this op
    # exists to avoid.
    key = jax.lax.optimization_barrier(key)
    return (g * _keep_mult(key, rate, g.shape, g.dtype), None)


dropout_remat.defvjp(_dropout_fwd, _dropout_bwd)


class RematDropout(nn.Module):
    """Drop-in for `nn.Dropout(rate)(x, deterministic=...)` with the
    rematerialized backward mask. Uses the module's "dropout" RNG stream."""
    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, *,
                 deterministic: bool) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        key = self.make_rng("dropout")
        return dropout_remat(x, key, float(self.rate))
