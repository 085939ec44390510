"""
Tensor-parallel parameter sharding rules.

The COOT/MART models are small (<= ~10M params), so pure data parallelism
is the efficient configuration (SURVEY.md §2.9) — but the framework
exposes a `model` mesh axis so larger instantiations shard without code
changes: `infer_param_shardings` maps parameter names to PartitionSpecs
(megatron-style: column-parallel q/k/v/up projections, row-parallel
output/down projections — GSPMD inserts the reduce-scatter/all-gather
pairs), and the train steps accept the resulting sharding pytree as their
state sharding. Everything not matched stays replicated.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

# (param-path regex, PartitionSpec for the kernel): column-parallel shards
# the OUTPUT feature dim (last), row-parallel the INPUT dim (first).
DEFAULT_TP_RULES: List[Tuple[str, P]] = [
    # attention projections (COOT + BERT naming)
    (r"(query|key|value)(_projection)?/kernel", P(None, MODEL_AXIS)),
    (r"final_projection/kernel", P(MODEL_AXIS, None)),
    (r"attention/self/(query|key|value)/kernel", P(None, MODEL_AXIS)),
    (r"attention/output/dense/kernel", P(MODEL_AXIS, None)),
    # feed-forward up/down
    (r"(pointwise|hidden_intermediate|intermediate)[^/]*/dense/kernel",
     P(None, MODEL_AXIS)),
    (r"linear1/kernel", P(None, MODEL_AXIS)),
    (r"linear2/kernel", P(MODEL_AXIS, None)),
    # big input projections (e.g. COOT input FC over 4096-d features)
    (r"input_fc/.*kernel", P(None, MODEL_AXIS)),
]


def _path_name(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def infer_param_shardings(params: Any, mesh: Mesh,
                          rules: Optional[List[Tuple[str, P]]] = None
                          ) -> Any:
    """
    Build a pytree of NamedShardings matching `params`: rule-matched
    kernels shard over the `model` axis (when present in the mesh and the
    dim is divisible), everything else replicated.
    """
    if rules is None:
        rules = DEFAULT_TP_RULES
    has_model_axis = MODEL_AXIS in mesh.axis_names
    model_size = (dict(zip(mesh.axis_names, mesh.devices.shape))
                  .get(MODEL_AXIS, 1))
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def assign(path, leaf):
        if has_model_axis and model_size > 1 and hasattr(leaf, "shape"):
            name = _path_name(path)
            for pat, spec in compiled:
                if pat.search(name) and len(spec) == len(leaf.shape):
                    # shard only if the dim divides evenly
                    ok = all(ax is None or leaf.shape[i] % model_size == 0
                             for i, ax in enumerate(spec))
                    if ok:
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_state_for_tp(state, mesh: Mesh,
                       rules: Optional[List[Tuple[str, P]]] = None):
    """
    Place a TrainState with TP param shardings: `params` (and matching
    optimizer moment pytrees) follow infer_param_shardings; scalars
    replicate. Returns (placed_state, state_sharding_pytree).
    """
    param_shardings = infer_param_shardings(state.params, mesh, rules)

    def match_or_replicate(tree):
        # optimizer moments mirror the param tree structure where possible
        try:
            return jax.tree_util.tree_map(
                lambda p, s: s, tree, param_shardings)
        except ValueError:
            return jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P()), tree)

    rep = NamedSharding(mesh, P())
    params_struct = jax.tree_util.tree_structure(state.params)

    def field_shardings(val):
        # param-structured subtrees (e.g. a CaptionTrainState's EMA
        # shadow) follow the param shardings, possibly nested inside a
        # NamedTuple wrapper; scalars/others replicate; None stays None
        if val is None:
            return None
        if jax.tree_util.tree_structure(val) == params_struct:
            return param_shardings
        if isinstance(val, tuple) and hasattr(val, "_fields"):
            return type(val)(*[field_shardings(v) for v in val])
        return jax.tree_util.tree_map(lambda _: rep, val)

    state_shardings = state._replace(
        params=param_shardings,
        opt_state=jax.tree_util.tree_map(
            lambda sub: (match_or_replicate(sub)
                         if isinstance(sub, type(state.params)) else sub),
            state.opt_state,
            is_leaf=lambda x: isinstance(x, type(state.params))),
        **{f: field_shardings(getattr(state, f)) for f in state._fields
           if f not in ("params", "opt_state")})
    # opt_state: AdamState(mu=param-tree, nu=param-tree, ...) — map each
    # param-structured subtree to the param shardings, scalars replicated
    opt_shardings = []
    for sub in state.opt_state:
        if jax.tree_util.tree_structure(sub) == \
                jax.tree_util.tree_structure(state.params):
            opt_shardings.append(param_shardings)
        else:
            opt_shardings.append(jax.tree_util.tree_map(
                lambda _: rep, sub))
    state_shardings = state_shardings._replace(
        opt_state=type(state.opt_state)(*opt_shardings))
    placed = jax.device_put(state, state_shardings)
    return placed, state_shardings
