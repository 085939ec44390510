"""
YAML config IO with scientific-float coercion and round-trip-verified dumping
(behavioral parity with reference nntrainer/utils_yaml.py:29-148).

PyYAML's safe loader parses `1e-4` as a string unless it matches the strict
YAML 1.1 float regex (`1.0e-4`); configs in the wild use the relaxed form, so
we coerce any string that python can parse as a float.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Union

import yaml

_FLOAT_RE = re.compile(
    r"^[-+]?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)$")


def _coerce_floats(node: Any) -> Any:
    if isinstance(node, dict):
        return {k: _coerce_floats(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_coerce_floats(v) for v in node]
    if isinstance(node, str) and _FLOAT_RE.match(node):
        return float(node)
    return node


def load_yaml_config_file(file: Union[str, Path]) -> Dict[str, Any]:
    """Load a yaml config file, coercing scientific-notation floats."""
    with open(file, "rt", encoding="utf8") as fh:
        data = yaml.safe_load(fh)
    if data is None:
        data = {}
    assert isinstance(data, dict), f"Config root must be a mapping: {file}"
    return _coerce_floats(data)


def convert_dict_to_yaml(data: Dict[str, Any], indent: int = 4) -> str:
    """Dump a dict to a yaml string."""
    return yaml.safe_dump(data, default_flow_style=False, indent=indent,
                          sort_keys=False)


def dump_yaml_config_file(file: Union[str, Path], data: Dict[str, Any]) -> None:
    """
    Dump config to yaml and verify the round trip reproduces the input
    (reference utils_yaml.py:123-148).
    """
    path = Path(file)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(convert_dict_to_yaml(data), encoding="utf8")
    reloaded = load_yaml_config_file(path)
    if _coerce_floats(data) != reloaded:
        raise ValueError(
            f"yaml round-trip verification failed for {file}")


def dump_json(data, file) -> None:
    """Write a small json sidecar (host state, not arrays)."""
    import json
    from pathlib import Path
    Path(file).write_text(json.dumps(data, indent=2), encoding="utf8")


def load_json(file):
    import json
    from pathlib import Path
    return json.loads(Path(file).read_text(encoding="utf8"))
