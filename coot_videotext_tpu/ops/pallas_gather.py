"""
Row gather from an HBM-resident table as a Pallas TPU kernel.

The device-resident data pipeline's hottest memory op is gathering sampled
frame rows from the feature store (e.g. 82k rows x 4096 features per
yc2_2d3d batch). This kernel streams rows with explicit async DMAs: row
indices arrive via scalar prefetch, each grid cell issues a block of
row-copies HBM->VMEM, and the pipeline double-buffers output blocks.

MEASURED NEGATIVE RESULT (kept for the record): on v5e the per-row DMA
issue cost on the scalar core dominates at this granularity — 82k x 8KB
rows ran at ~2 GB/s vs XLA's generic gather at ~105 GB/s (6.4 ms for the
yc2_2d3d batch). The production pipeline therefore uses the XLA gather
(data/device_store.py gather_dense_batch); this kernel remains as the
scalar-prefetch DMA reference pattern and for granularities where a row
is large enough to amortize the issue cost.

Forward-only (gathers feed the model input; no gradient flows back into
the feature store), wrapped in custom_vjp returning zero cotangents for
the table/index inputs is unnecessary — jax treats integer-indexed gather
of a constant store as non-differentiable w.r.t. the store, and the store
is never a differentiated argument in the train steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, table_ref, o_ref, sems, *, rows_per_block):
    """Copy rows table[idx[g*R + r]] -> o[r] with R DMAs in flight."""
    g = pl.program_id(0)
    base = g * rows_per_block

    def start(r, _):
        row = idx_ref[base + r]
        pltpu.make_async_copy(
            table_ref.at[row], o_ref.at[r], sems.at[r]).start()
        return 0

    jax.lax.fori_loop(0, rows_per_block, start, 0)

    def wait(r, _):
        row = idx_ref[base + r]
        pltpu.make_async_copy(
            table_ref.at[row], o_ref.at[r], sems.at[r]).wait()
        return 0

    jax.lax.fori_loop(0, rows_per_block, wait, 0)


def _sublanes(dtype) -> int:
    """Mosaic sublane tiling per dtype (pallas guide: f32 8, bf16 16)."""
    return 16 if dtype == jnp.bfloat16 else 8


@functools.partial(jax.jit,
                   static_argnames=("rows_per_block", "interpret"))
def pallas_gather_rows(table: jnp.ndarray, idx: jnp.ndarray,
                       rows_per_block: int = 256,
                       interpret: bool = False) -> jnp.ndarray:
    """
    Args:
        table: (T, D) feature store (stays in HBM); D must be divisible
            by sublanes*128 (e.g. 4096 for both f32 and bf16) — single
            rows are DMA'd as tile-aligned (sublanes, D/sublanes) blocks
        idx: (N,) int32 row indices
        interpret: run under the TPU interpret machine (CPU testing)

    Returns (N, D) gathered rows, table dtype.
    """
    n = idx.shape[0]
    t, d = table.shape
    s = _sublanes(table.dtype)
    assert d % (s * 128) == 0, (
        f"feature dim {d} must be divisible by {s * 128} for the "
        f"tile-aligned row DMA; use gather_rows_reference otherwise")
    r = rows_per_block
    while n % r:
        r //= 2
    grid = n // r
    table3 = table.reshape(t, s, d // s)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, rows_per_block=r),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((r, s, d // s),
                                   lambda g, idx: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((r,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n, s, d // s), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=False),
        cost_estimate=pl.CostEstimate(
            flops=0, transcendentals=0,
            bytes_accessed=2 * n * d * table.dtype.itemsize),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(idx.astype(jnp.int32), table3)
    return out.reshape(n, d)


def gather_rows_reference(table: jnp.ndarray,
                          idx: jnp.ndarray) -> jnp.ndarray:
    """XLA gather for tests/benchmarks."""
    return jnp.take(table, idx, axis=0)
