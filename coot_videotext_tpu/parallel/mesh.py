"""
Device mesh construction and sharding helpers.

The reference's only parallelism is single-process nn.DataParallel
(reference trainer_base.py:127). The TPU-native equivalent is SPMD data
parallelism over a 1-D `data` mesh axis: batches are sharded over `data`,
parameters are replicated, and the train step is written as a GLOBAL
computation — XLA/GSPMD inserts the collectives. In particular the
contrastive loss's similarity matrix spans the full global batch, so the
negative pool matches the reference's single-device semantics exactly
(SURVEY.md §2.9: reference batch = global batch on 1 GPU); the all-gather of
per-shard embeddings is inserted by the partitioner and rides ICI.

The mesh is N-D ready (`mesh_shape` config, e.g. {"data": 4, "model": 2});
the COOT/MART models are small (<=10M params) so only `data` is used today,
but every entry point threads the mesh through so model axes can be adopted
without API changes.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(mesh_shape: Optional[Dict[str, int]] = None,
             devices=None) -> Mesh:
    """
    Build a Mesh. Default: all local devices on a 1-D `data` axis.
    `mesh_shape` maps axis names to sizes; total must divide the device count.
    """
    if devices is None:
        devices = jax.devices()
    if not mesh_shape:
        mesh_shape = {DATA_AXIS: len(devices)}
    axis_names = tuple(mesh_shape.keys())
    sizes = tuple(mesh_shape.values())
    n_needed = int(np.prod(sizes))
    assert n_needed <= len(devices), (
        f"mesh {mesh_shape} needs {n_needed} devices, "
        f"have {len(devices)}")
    dev_array = np.asarray(devices[:n_needed]).reshape(sizes)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree replicated over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(params, sharding)


def donate_argnums_for(mesh: Mesh, argnums=(0,)):
    """Buffer donation for the train-state arg. Disabled on the CPU
    backend: donated buffers + multi-device collectives deadlock the XLA
    CPU in-process communicator (observed: 7/8 threads reach a rendezvous,
    the 8th is blocked; removing donation resolves it). On TPU donation
    saves an HBM copy of params+opt state per step."""
    platform = mesh.devices.flat[0].platform
    return () if platform == "cpu" else tuple(argnums)
