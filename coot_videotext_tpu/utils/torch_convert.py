"""
Convert reference PyTorch checkpoints to this framework's flax param trees.

The reference saves ``model_<ep>.pth`` as ``{model_name: state_dict}``
(nntrainer/model_manager_base.py:74-84); for retrieval the model names are
the four COOT nets (coot/model_retrieval.py:82), for captioning it is
``{"model": state_dict}`` (mart/trainer_caption.py:98). This module maps the
torch parameter names onto our flax module paths so a user can bring
checkpoints trained with the reference:

    python convert_checkpoint.py experiments/.../models/model_5.pth \
        -c config/retrieval/paper2020/yc2_100m_coot.yaml -o converted_ckpt
    # or directly:  python train_retrieval.py -c ... --load_model model_5.pth

Key transforms:
    - torch ``nn.Linear.weight`` is (out, in); flax ``Dense.kernel`` is
      (in, out) -> transpose.
    - the COOT layer norm stores gain/bias (normalizations.py:94-95); our
      CootLayerNorm uses the same names. BERT-style ``BertLayerNorm.weight``
      (mart/model.py:153) maps to flax ``LayerNorm.scale``.
    - ``nn.Embedding.weight`` is (vocab, dim) like flax ``Embed.embedding``
      -> copied as-is; same for the stacked GenPool head tensors
      (poolers.py:129-139, stored identically here).
    - non-parameter buffers (sincos ``pe``, ``fixed_ones``, ``genpool_one``,
      label-smoothing one-hot) are dropped.

Torch sequential-container indices are resolved per scope: e.g. the MART
word_fc ``Sequential(LayerNorm, Dropout, Linear, ReLU, LayerNorm)``
(mart/model.py:474-480) becomes word_ln_in / word_fc / word_ln_out, and the
COOT MLP's interleaved Linear/norm stack (nntrainer/models/mlp.py:84-123)
maps in order onto fc_0..fc_{n-1} / CootLayerNorm_0.. names.

All functions take/return numpy; torch is only imported inside
load_torch_model_state so the module stays importable without it.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

FlatParams = Dict[Tuple[str, ...], np.ndarray]

# buffers that exist in torch state dicts but are not parameters here
_SKIP_PATTERNS = [
    r"(^|\.)embedding\.pe$",                 # sincos buffer (encoder.py:100)
    r"(^|\.)position_embeddings(_text|_video)?\.pe$",
    r"\.fixed_ones$",                        # LearnableClsToken helper
    r"\.genpool_one$",                       # GenPool helper
    r"^loss_func\.",                         # LabelSmoothingLoss buffer
    r"\.num_batches_tracked$",
    r"^encoder\.pos_emb\.inv_freq$",         # XL sincos buffer (model.py:848)
]


def _skip(key: str) -> bool:
    return any(re.search(p, key) for p in _SKIP_PATTERNS)


def load_torch_model_state(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Load a reference model_<ep>.pth into {model_name: {key: ndarray}}."""
    import torch
    state = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for name, sd in state.items():
        out[name] = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return out


# ---------- COOT retrieval nets (TransformerLegacy) ----------

def _convert_mlp_scope(keys: Dict[str, np.ndarray]) -> FlatParams:
    """
    Map one torch MLP (mlp.py:46) onto our MLP names: Linears in
    sequential order -> fc_0..; COOT layer norms in order ->
    CootLayerNorm_0..; the optional linear residual -> residual_fc.
    `keys` are relative to the MLP module (e.g. 'mlp.0.weight').
    """
    out: FlatParams = {}
    groups: Dict[int, Dict[str, np.ndarray]] = {}
    for key, val in keys.items():
        res = re.fullmatch(r"residual\.(weight|bias)", key)
        if res:
            if res.group(1) == "weight":
                out[("residual_fc", "kernel")] = val.T
            else:
                out[("residual_fc", "bias")] = val
            continue
        m = re.fullmatch(r"mlp\.(\d+)\.(\w+)", key)
        assert m, f"unrecognized MLP param {key}"
        groups.setdefault(int(m.group(1)), {})[m.group(2)] = val
    n_fc = n_norm = 0
    for idx in sorted(groups):
        g = groups[idx]
        if "weight" in g and g["weight"].ndim == 2:        # nn.Linear
            out[(f"fc_{n_fc}", "kernel")] = g["weight"].T
            if "bias" in g:
                out[(f"fc_{n_fc}", "bias")] = g["bias"]
            n_fc += 1
        elif "gain" in g:                                  # COOT layer norm
            out[(f"CootLayerNorm_{n_norm}", "gain")] = g["gain"]
            out[(f"CootLayerNorm_{n_norm}", "bias")] = g["bias"]
            n_norm += 1
        else:
            raise NotImplementedError(
                f"MLP submodule at index {idx} with params {sorted(g)} "
                f"(batchnorm inside MLPs is not supported)")
    return out


# torch attention/sublayer names inside one encoder layer -> our names.
# torch: tf.encoder_layers.{i}.self_attention_layer.sublayer.<proj> and
# .layer_normalization; .pointwise_feedforward_layer.sublayer.feed_forward.
_COOT_LAYER_RULES = [
    (r"self_attention_layer\.sublayer\."
     r"(query|key|value|final)_projection\.(weight|bias)",
     lambda m: ("self_attention", f"{m.group(1)}_projection",
                "kernel" if m.group(2) == "weight" else "bias")),
    (r"self_attention_layer\.layer_normalization\.(gain|bias)",
     lambda m: ("CootLayerNorm_0", m.group(1))),
    (r"pointwise_feedforward_layer\.sublayer\.feed_forward\.0\."
     r"(weight|bias)",
     lambda m: ("pointwise_ff", "fc1",
                "kernel" if m.group(1) == "weight" else "bias")),
    (r"pointwise_feedforward_layer\.sublayer\.feed_forward\.3\."
     r"(weight|bias)",
     lambda m: ("pointwise_ff", "fc2",
                "kernel" if m.group(1) == "weight" else "bias")),
    (r"pointwise_feedforward_layer\.layer_normalization\.(gain|bias)",
     lambda m: ("CootLayerNorm_1", m.group(1))),
]


def convert_coot_net(torch_sd: Dict[str, np.ndarray]) -> FlatParams:
    """One TransformerLegacy net (transformer_legacy.py:115) -> flat flax."""
    out: FlatParams = {}
    mlp_scopes: Dict[str, Dict[str, np.ndarray]] = {}
    for key, val in torch_sd.items():
        if _skip(key):
            continue
        m = re.fullmatch(r"norm_input\.(gain|bias)", key)
        if m:
            out[("CootLayerNorm_0", m.group(1))] = val
            continue
        if re.fullmatch(r"norm_input\.(weight|bias|running_\w+)", key):
            raise NotImplementedError(
                "only the COOT layer-norm input normalization is "
                f"convertible, got torch key {key}")
        m = re.fullmatch(r"(input_fc|output_fc)\.(.+)", key)
        if m:
            mlp_scopes.setdefault(m.group(1), {})[m.group(2)] = val
            continue
        if key == "net_cls.cls_param":
            out[("cls_token", "cls_token")] = val
            continue
        if key == "linear_out.weight":
            out[("linear_out", "kernel")] = val.T
            continue
        m = re.fullmatch(
            r"(tf|tf_context)\.encoder_layers\.(\d+)\.(.+)", key)
        if m:
            stack, layer, rest = m.group(1), int(m.group(2)), m.group(3)
            for pattern, build in _COOT_LAYER_RULES:
                lm = re.fullmatch(pattern, rest)
                if lm:
                    val2 = val.T if build(lm)[-1] == "kernel" else val
                    out[(stack, f"layer_{layer}") + build(lm)] = val2
                    break
            else:
                raise NotImplementedError(
                    f"unrecognized encoder-layer param {key}")
            continue
        m = re.fullmatch(r"pooler\.pools\.(\d+)\.(genpool_\w+)", key)
        if m:
            out[("pooler", f"pool_{m.group(1)}", m.group(2))] = val
            continue
        raise NotImplementedError(f"unrecognized COOT net param {key}")
    for scope, keys in mlp_scopes.items():
        for path, val in _convert_mlp_scope(keys).items():
            out[(scope,) + path] = val
    return out


def convert_retrieval_model_state(
        torch_state: Dict[str, Dict[str, np.ndarray]]) -> FlatParams:
    """{net_name: state_dict} (4 COOT nets) -> one flat flax tree."""
    out: FlatParams = {}
    for net_name, sd in torch_state.items():
        for path, val in convert_coot_net(sd).items():
            out[(net_name,) + path] = val
    return out


# ---------- MART caption models (mart/model.py) ----------

# torch Sequential index -> our name for the 5-element embedding stacks
# Sequential(BertLayerNorm, Dropout, Linear, ReLU, BertLayerNorm)
# (mart/model.py:474-487)
_EMB_SEQ = {0: "ln_in", 2: "fc", 4: "ln_out"}


def _bert_ln(val_name: str) -> str:
    """BertLayerNorm stores weight/bias (model.py:153); flax scale/bias."""
    return "scale" if val_name == "weight" else "bias"


def _convert_mart_key(key: str, val: np.ndarray):
    """One torch MART param -> (flax path tuple, array) or None to skip."""
    # the reference's no-memory layers construct a `memory_intermediate`
    # submodule that their forward never calls (mart/model.py:340,602) —
    # dead randomly-initialized params; the flax models don't carry them
    if ".memory_intermediate." in key:
        return None
    # --- embeddings ---
    m = re.fullmatch(r"embeddings\.word_embeddings\.weight", key)
    if m:
        return ("embeddings", "word_embeddings", "embedding"), val
    m = re.fullmatch(r"embeddings\.token_type_embeddings\.weight", key)
    if m:
        return ("embeddings", "token_type_embeddings", "embedding"), val
    m = re.fullmatch(
        r"embeddings\.(word_fc|video_embeddings)\.(\d+)\.(weight|bias)", key)
    if m:
        stem = "word" if m.group(1) == "word_fc" else "video"
        part = _EMB_SEQ[int(m.group(2))]
        if part == "fc":
            name = "kernel" if m.group(3) == "weight" else "bias"
            v = val.T if name == "kernel" else val
            return ("embeddings", f"{stem}_fc", name), v
        return ("embeddings", f"{stem}_{part}", _bert_ln(m.group(3))), val
    m = re.fullmatch(r"embeddings\.LayerNorm\.(weight|bias)", key)
    if m:
        return ("embeddings", "LayerNorm", _bert_ln(m.group(1))), val

    # --- encoder layers ---
    m = re.fullmatch(r"encoder\.layer\.(\d+)\.(.+)", key)
    if m:
        layer, rest = f"layer_{m.group(1)}", m.group(2)

        mm = re.fullmatch(
            r"(attention\.self|memory_augmented_attention|"
            r"memory_updater\.memory_update_attention)"
            r"\.(query|key|value)\.(weight|bias)", rest)
        if mm:
            scope = tuple(mm.group(1).split("."))
            name = "kernel" if mm.group(3) == "weight" else "bias"
            v = val.T if name == "kernel" else val
            return ("encoder", layer) + scope + (mm.group(2), name), v
        mm = re.fullmatch(
            r"(attention\.output|output|hidden_intermediate|"
            r"memory_intermediate)\.dense\.(weight|bias)", rest)
        if mm:
            scope = tuple(mm.group(1).split("."))
            name = "kernel" if mm.group(2) == "weight" else "bias"
            v = val.T if name == "kernel" else val
            return ("encoder", layer) + scope + ("dense", name), v
        mm = re.fullmatch(
            r"(attention\.output|output)\.LayerNorm\.(weight|bias)", rest)
        if mm:
            scope = tuple(mm.group(1).split("."))
            return (("encoder", layer) + scope +
                    ("LayerNorm", _bert_ln(mm.group(2)))), val
        mm = re.fullmatch(
            r"memory_initilizer\.init_memory_bias", rest)
        if mm:
            return ("encoder", layer, "memory_initilizer",
                    "init_memory_bias"), val
        mm = re.fullmatch(
            r"memory_initilizer\.init_memory_fc\.(\d+)\.(weight|bias)", rest)
        if mm:
            if mm.group(1) == "0":      # Linear (model.py:731-734)
                name = "kernel" if mm.group(2) == "weight" else "bias"
                v = val.T if name == "kernel" else val
                return ("encoder", layer, "memory_initilizer",
                        "init_memory_fc", name), v
            return ("encoder", layer, "memory_initilizer",
                    "init_memory_ln", _bert_ln(mm.group(2))), val
        mm = re.fullmatch(
            r"memory_updater\.(mc|sc|mz|sz)\.(weight|bias)", rest)
        if mm:
            name = "kernel" if mm.group(2) == "weight" else "bias"
            v = val.T if name == "kernel" else val
            return ("encoder", layer, "memory_updater", mm.group(1), name), v
        mm = re.fullmatch(r"memory_projection\.(weight|bias)", rest)
        if mm:
            name = "kernel" if mm.group(1) == "weight" else "bias"
            v = val.T if name == "kernel" else val
            return ("encoder", layer, "memory_projection", name), v
        raise NotImplementedError(f"unrecognized encoder param {key}")

    # --- prediction head (BertLMPredictionHead, model.py:802-823) ---
    m = re.fullmatch(r"decoder\.transform\.dense\.(weight|bias)", key)
    if m:
        name = "kernel" if m.group(1) == "weight" else "bias"
        v = val.T if name == "kernel" else val
        return ("decoder", "transform_dense", name), v
    m = re.fullmatch(r"decoder\.transform\.LayerNorm\.(weight|bias)", key)
    if m:
        return ("decoder", "transform_ln", _bert_ln(m.group(1))), val
    if key == "decoder.decoder.weight":
        return ("decoder", "decoder", "kernel"), val.T
    if key == "decoder.bias":
        return ("decoder", "bias"), val

    raise NotImplementedError(f"unrecognized MART param {key}")


def _lin(name_grp: str, val: np.ndarray):
    """torch Linear weight/bias -> (flax leaf name, value)."""
    name = "kernel" if name_grp == "weight" else "bias"
    return name, (val.T if name == "kernel" else val)


def _convert_untied_key(key: str, val: np.ndarray):
    """NonRecurTransformerUntied params (reference model.py:1261-1333):
    separate text/video embedding stacks, a memory-free BERT encoder over
    video, and a causal text decoder with cross-attention."""
    m = re.fullmatch(
        r"video_embeddings\.video_embeddings\.(\d+)\.(weight|bias)", key)
    if m:
        part = _EMB_SEQ[int(m.group(1))]
        if part == "fc":
            name, v = _lin(m.group(2), val)
            return ("video_embeddings", "video_fc", name), v
        return ("video_embeddings", f"video_{part}",
                _bert_ln(m.group(2))), val
    m = re.fullmatch(
        r"decoder\.layer\.(\d+)\.(self_attention|dec_enc_attention)"
        r"\.(query|key|value)\.(weight|bias)", key)
    if m:
        name, v = _lin(m.group(4), val)
        return ("decoder", f"layer_{m.group(1)}", m.group(2),
                m.group(3), name), v
    m = re.fullmatch(r"decoder\.layer\.(\d+)\.(norm1|norm2)"
                     r"\.(weight|bias)", key)
    if m:
        return ("decoder", f"layer_{m.group(1)}", m.group(2),
                _bert_ln(m.group(3))), val
    m = re.fullmatch(r"decoder\.layer\.(\d+)\.output\.dense"
                     r"\.(weight|bias)", key)
    if m:
        name, v = _lin(m.group(2), val)
        return ("decoder", f"layer_{m.group(1)}", "output", "dense",
                name), v
    m = re.fullmatch(r"decoder\.layer\.(\d+)\.output\.LayerNorm"
                     r"\.(weight|bias)", key)
    if m:
        return ("decoder", f"layer_{m.group(1)}", "output", "LayerNorm",
                _bert_ln(m.group(2))), val
    m = re.fullmatch(r"decoder_classifier\.(.+)", key)
    if m:
        # same head layout as the recurrent family's `decoder.*`
        path_val = _convert_mart_key(f"decoder.{m.group(1)}", val)
        return (("decoder_classifier",) + path_val[0][1:], path_val[1])
    # text embeddings + encoder layers share the recurrent family's layout
    return _convert_mart_key(key, val)


_XL_CORENET = {0: "fc1", 3: "fc2"}  # Sequential(Linear, ReLU, Drop, Linear)


def _convert_xl_key(key: str, val: np.ndarray):
    """TransformerXL params (reference model.py:848-1145): shared
    embeddings (no positional add), relative-position attention layers
    with global content/position biases, same prediction head."""
    if key in ("encoder.r_w_bias", "encoder.r_r_bias"):
        return ("encoder", key.split(".")[1]), val
    m = re.fullmatch(
        r"encoder\.layers\.(\d+)\.dec_attn\.(qkv_net|r_net|o_net)"
        r"\.weight", key)
    if m:
        return ("encoder", f"layer_{m.group(1)}", "dec_attn",
                m.group(2), "kernel"), val.T
    m = re.fullmatch(r"encoder\.layers\.(\d+)\.dec_attn\.layer_norm"
                     r"\.(weight|bias)", key)
    if m:
        return ("encoder", f"layer_{m.group(1)}", "dec_attn",
                "layer_norm", _bert_ln(m.group(2))), val
    m = re.fullmatch(r"encoder\.layers\.(\d+)\.pos_ff\.CoreNet"
                     r"\.(\d+)\.(weight|bias)", key)
    if m:
        name, v = _lin(m.group(3), val)
        return ("encoder", f"layer_{m.group(1)}", "pos_ff",
                _XL_CORENET[int(m.group(2))], name), v
    m = re.fullmatch(r"encoder\.layers\.(\d+)\.pos_ff\.layer_norm"
                     r"\.(weight|bias)", key)
    if m:
        return ("encoder", f"layer_{m.group(1)}", "pos_ff",
                "layer_norm", _bert_ln(m.group(2))), val
    # embeddings + prediction head share the recurrent family's layout
    return _convert_mart_key(key, val)


_MTRANS_LN = {"gamma": "gamma", "beta": "beta"}


def _convert_mtrans_key(key: str, val: np.ndarray):
    """MTransformer params (reference masked_transformer.py): densecap
    encoder-decoder with per-layer residual-norm blocks and an
    embedding-tied output matrix."""
    m = re.fullmatch(r"encoder\.video_embeddings\.(\d+)\.(gamma|beta)",
                     key)
    if m:
        return ("video_ln", m.group(2)), val
    m = re.fullmatch(r"encoder\.video_embeddings\.(\d+)\.(weight|bias)",
                     key)
    if m:
        name, v = _lin(m.group(2), val)
        return ("video_fc", name), v

    m = re.fullmatch(
        r"(encoder|decoder)\.layers\.(\d+)\.(selfattn|attention)"
        r"\.layer\.(wq|wk|wv|wo)\.weight", key)
    if m:
        side = "enc" if m.group(1) == "encoder" else "dec"
        return (f"{side}_layer_{m.group(2)}", m.group(3), m.group(4),
                "kernel"), val.T
    m = re.fullmatch(
        r"(encoder|decoder)\.layers\.(\d+)\.(selfattn|attention)"
        r"\.layernorm\.(gamma|beta)", key)
    if m:
        side = "enc" if m.group(1) == "encoder" else "dec"
        if m.group(3) == "selfattn":
            res = "res_attn" if side == "enc" else "res_self"
        else:
            res = "res_cross"
        return (f"{side}_layer_{m.group(2)}", res, "layernorm",
                m.group(4)), val
    m = re.fullmatch(
        r"(encoder|decoder)\.layers\.(\d+)\.feedforward\.layer"
        r"\.(linear1|linear2)\.(weight|bias)", key)
    if m:
        side = "enc" if m.group(1) == "encoder" else "dec"
        name, v = _lin(m.group(4), val)
        return (f"{side}_layer_{m.group(2)}", "feedforward", m.group(3),
                name), v
    m = re.fullmatch(
        r"(encoder|decoder)\.layers\.(\d+)\.feedforward\.layernorm"
        r"\.(gamma|beta)", key)
    if m:
        side = "enc" if m.group(1) == "encoder" else "dec"
        return (f"{side}_layer_{m.group(2)}", "res_ff", "layernorm",
                m.group(3)), val
    if key == "decoder.out.weight":
        return ("out_kernel",), val.T
    if key == "decoder.out.bias":
        return ("out_bias",), val
    raise NotImplementedError(f"unrecognized MTransformer param {key}")


def detect_mart_family(torch_sd: Dict[str, np.ndarray]) -> str:
    """Infer the caption architecture from its state-dict key shapes."""
    keys = torch_sd.keys()
    if any(k.startswith("video_embeddings.") for k in keys):
        return "untied"
    if any(".dec_attn." in k for k in keys):
        return "xl"
    if any(".selfattn.layer." in k for k in keys):
        return "mtrans"
    return "mart"


_MART_CONVERTERS = {
    "mart": _convert_mart_key,
    "untied": _convert_untied_key,
    "xl": _convert_xl_key,
    "mtrans": _convert_mtrans_key,
}


def convert_mart_model_state(torch_sd: Dict[str, np.ndarray],
                             family: str = None) -> FlatParams:
    """MART-family 'model' state dict -> flat flax tree. Handles all five
    architectures (recurrent/single via 'mart', untied, transformer-xl,
    masked-transformer); family=None auto-detects from the keys."""
    conv = _MART_CONVERTERS[family or detect_mart_family(torch_sd)]
    out: FlatParams = {}
    for key, val in torch_sd.items():
        if _skip(key):
            continue
        path_val = conv(key, val)
        if path_val is not None:
            out[path_val[0]] = path_val[1]
    return out


# ---------- assembly ----------

def unflatten(flat: FlatParams) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for path, val in flat.items():
        node = out
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = val
    return out


def apply_converted(params_template, flat: FlatParams):
    """
    Fill a template param tree (from model init) with converted values.
    Strict: every template leaf must be covered with the exact shape, and
    every converted tensor must be consumed — a mismatch means the config
    used for conversion doesn't match the checkpoint.
    """
    import jax

    used = set()

    def fill(path, leaf):
        key = tuple(str(getattr(p, "key", p)) for p in path)
        if key not in flat:
            raise KeyError(
                f"converted checkpoint is missing param {'/'.join(key)} "
                f"(template shape {tuple(leaf.shape)})")
        val = flat[key]
        if tuple(val.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch for {'/'.join(key)}: checkpoint "
                f"{tuple(val.shape)} vs model {tuple(leaf.shape)}")
        if not np.isfinite(val).all():
            # e.g. the reference XL's r_w_bias/r_r_bias are uninitialized
            # memory when saved untrained (model.py:1088-1089) — importing
            # inf/NaN silently poisons every downstream computation
            raise ValueError(
                f"non-finite values in checkpoint param {'/'.join(key)}"
                " — corrupted or never-initialized (see reference XL "
                "r_w_bias); refusing to import")
        used.add(key)
        return val.astype(np.asarray(leaf).dtype)

    new_params = jax.tree_util.tree_map_with_path(fill, params_template)
    unused = set(flat) - used
    if unused:
        raise ValueError(
            "converted checkpoint has parameters the model does not: "
            + ", ".join("/".join(k) for k in sorted(unused)[:10]))
    return new_params


def convert_model_file(path: str, model_state_template):
    """
    Load a reference .pth model checkpoint and convert it into this
    framework's model state ({'params': tree}), auto-detecting retrieval
    ({net_*: sd}) vs caption ({'model': sd}) layouts.
    """
    torch_state = load_torch_model_state(path)
    keys = set(torch_state)
    if keys == {"model"}:
        flat = convert_mart_model_state(torch_state["model"])
    elif all(k.startswith("net_") for k in keys):
        flat = convert_retrieval_model_state(torch_state)
    else:
        raise ValueError(
            f"unrecognized reference checkpoint layout with models {keys}")
    params = apply_converted(model_state_template["params"], flat)
    out = dict(model_state_template)
    out["params"] = params
    if out.get("ema") is not None:
        # warmstarting EMA from the loaded weights beats keeping random init
        out["ema"] = params
    return out
