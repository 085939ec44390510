"""
Typed-config / constants runtime.

TPU-native counterpart of the reference's nntrainer/typext.py (ConfigClass,
SaveableBaseModel, ConstantHolder, INF). Instead of pydantic tensor tuples the
batch containers here are plain dict-of-ndarray pytrees with explicit shape
checks (see coot_videotext_tpu/data); this file keeps the config/constants
substrate that everything else builds on.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, List, Union

# fp16-safe infinity (reference nntrainer/typext.py:24). We keep the same
# constant for additive attention masks: bf16 has fp32's exponent range so it
# would tolerate a larger value, but 32752 keeps masked-softmax numerics
# comparable with the reference's released checkpoints.
INF = 32752.0


class ConfigClass:
    """Base class for configuration objects (reference typext.py:29)."""

    def __repr__(self) -> str:
        parts = []
        for key, value in vars(self).items():
            if isinstance(value, ConfigClass):
                value_str = repr(value).replace("\n", "\n    ")
                parts.append(f"{key}:\n    {value_str}")
            else:
                parts.append(f"{key}: {value}")
        return f"{type(self).__name__}\n  " + "\n  ".join(
            p.replace("\n", "\n  ") for p in parts)


class ConstantHolderMeta(type):
    """Metaclass registering all uppercase string attributes as values."""

    def __new__(mcs, name, bases, namespace):
        cls = super().__new__(mcs, name, bases, namespace)
        values: List[Any] = []
        keys: List[str] = []
        for base in reversed(cls.__mro__):
            for key, value in vars(base).items():
                if key.startswith("_") or callable(value) or isinstance(
                        value, (classmethod, staticmethod, property)):
                    continue
                if key not in keys:
                    keys.append(key)
                    values.append(value)
        cls._keys = keys
        cls._values = values
        return cls

    def __contains__(cls, item) -> bool:
        return item in cls._values

    def __iter__(cls):
        return iter(cls._values)


class ConstantHolder(metaclass=ConstantHolderMeta):
    """
    Enum replacement: class-level string constants with containment checks
    (reference typext.py:294). Usage: ``class Split(ConstantHolder): TRAIN = "train"``.
    """

    @classmethod
    def values(cls) -> List[Any]:
        return list(cls._values)

    @classmethod
    def keys(cls) -> List[str]:
        return list(cls._keys)

    @classmethod
    def assert_valid(cls, value: Any) -> None:
        if value not in cls._values:
            raise ValueError(
                f"{value!r} is not a valid {cls.__name__}; valid: {cls._values}")


class SaveableState:
    """
    JSON-round-trippable dataclass mixin for trainer state
    (reference typext.py:55 SaveableBaseModel). Subclasses must be dataclasses.
    """

    def save(self, file: Union[str, Path]) -> None:
        path = Path(file)
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(path.suffix + ".tmp")
        tmp.write_text(json.dumps(dataclasses.asdict(self), indent=2))
        tmp.replace(path)

    def load(self, file: Union[str, Path]) -> "SaveableState":
        data = json.loads(Path(file).read_text())
        self.apply_dict(data)
        return self

    def apply_dict(self, data: Dict[str, Any]) -> None:
        field_names = {f.name for f in dataclasses.fields(self)}
        for key, value in data.items():
            if key not in field_names:
                raise KeyError(
                    f"Unknown field {key} for state {type(self).__name__}")
            setattr(self, key, value)

    @classmethod
    def create_from_file(cls, file: Union[str, Path]):
        obj = cls()
        obj.load(file)
        return obj


# ---------- TypedNamedTuple: shape-validated data tuples ----------

TENSOR_TYPES = None  # resolved lazily to avoid importing jax at module load


def _tensor_types():
    global TENSOR_TYPES
    if TENSOR_TYPES is None:
        import jax
        import numpy as np
        TENSOR_TYPES = (np.ndarray, jax.Array)
    return TENSOR_TYPES


def nested_shape_check(field_name: str, tensor_container: Any,
                       shape: List[Optional[int]]) -> None:
    """
    Check a tensor (or any container of tensors) against a shape spec with
    None wildcards (reference typext.py:111 _nested_shape_check). Raises
    AssertionError on shape mismatch, TypeError on non-tensor leaves.
    """
    from collections.abc import Iterable, Mapping
    if isinstance(tensor_container, _tensor_types()):
        value_shape = tensor_container.shape
        err = (f"Shape mismatch, input {value_shape} defined {shape} "
               f"on field {field_name}")
        assert len(value_shape) == len(shape), err
        for s1, s2 in zip(value_shape, shape):
            assert s2 is None or s1 == s2, err
    elif isinstance(tensor_container, Mapping):
        for sub in tensor_container.values():
            nested_shape_check(field_name, sub, shape)
    elif isinstance(tensor_container, Iterable):
        for sub in tensor_container:
            nested_shape_check(field_name, sub, shape)
    else:
        raise TypeError(
            f"Tensor shape check on class {type(tensor_container)} not "
            f"supported, field {field_name}.")


class TypedNamedTuple:
    """
    NamedTuple-style container with runtime tensor shape validation
    (reference typext.py:235 TypedNamedTuple, minus the torch/pydantic
    machinery; `to_cuda` has no equivalent — device placement is the
    pipeline's `device_put`). Subclass with annotated fields and an
    optional `_shapes_dict` of shape specs (None = wildcard dim):

        class Batch(TypedNamedTuple):
            key: str
            data: jnp.ndarray
            _shapes_dict = {"data": (None, 6)}
    """

    _shapes_dict: Dict[str, Any] = {}

    def __init__(self, *args, **kwargs) -> None:
        fields = [f for f in type(self).__annotations__
                  if not f.startswith("_")]
        assert len(args) <= len(fields), (
            f"Too many ({len(args)}) arguments for "
            f"{type(self).__name__}")
        for field, arg in zip(fields, args):
            assert field not in kwargs, (
                f"Duplicate argument '{field}' for "
                f"{type(self).__name__}.")
            kwargs[field] = arg
        missing = [f for f in fields if f not in kwargs]
        assert not missing, (
            f"Missing arguments {missing} for {type(self).__name__}")
        self._fields = fields
        for field in fields:
            setattr(self, field, kwargs[field])
        self.validate_shapes()

    def __len__(self) -> int:
        return len(self._fields)

    def dict(self) -> Dict[str, Any]:
        return {f: getattr(self, f) for f in self._fields}

    def tuple(self) -> tuple:
        return tuple(self.dict().values())

    def keys(self):
        return self.dict().keys()

    def values(self):
        return self.dict().values()

    def items(self):
        return self.dict().items()

    def validate_shapes(self) -> None:
        for key, shape in self._shapes_dict.items():
            nested_shape_check(key, getattr(self, key), shape)
