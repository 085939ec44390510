"""
Checkpoint save/restore: orbax for array pytrees, json sidecars elsewhere.

TPU-native replacement for the reference's torch.save/load checkpointing
(reference trainer_base.py:672-716). Pytrees (params, optimizer state, EMA)
are converted to pure state dicts (flax.serialization) and stored as orbax
checkpoint DIRECTORIES; the trainerstate/metrics json sidecars keep the
reference's exact file names and schema (SURVEY.md §5.4).
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any, Optional, Union

import jax
import orbax.checkpoint as ocp
from flax import serialization as fser

PyTree = Any


def save_pytree(path: Union[str, Path], tree: PyTree) -> None:
    """Save a pytree (NamedTuples/dicts of arrays) as an orbax dir."""
    path = Path(path).absolute()
    if path.exists():
        shutil.rmtree(path)
    state_dict = fser.to_state_dict(jax.device_get(tree))
    ocp.PyTreeCheckpointer().save(str(path), state_dict)


def restore_pytree(path: Union[str, Path],
                   template: Optional[PyTree] = None) -> PyTree:
    """
    Restore a pytree. With `template`, the raw state dict is poured back
    into the template's structure (NamedTuples etc. reconstructed) — pass
    the CURRENT state to get dtypes/shapes validated implicitly.
    """
    raw = ocp.PyTreeCheckpointer().restore(str(Path(path).absolute()))
    if template is None:
        return raw
    return fser.from_state_dict(template, raw)


def checkpoint_exists(path: Union[str, Path]) -> bool:
    return Path(path).is_dir()


def delete_checkpoint(path: Union[str, Path]) -> None:
    p = Path(path)
    if p.is_dir():
        shutil.rmtree(p)
