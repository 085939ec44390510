"""
Golden parity tests for the reference-checkpoint converter
(utils/torch_convert.py): build the ACTUAL reference torch models from the
read-only mount, convert their state dicts, and require our flax models to
reproduce the torch forward outputs to float32 precision.

The reference targets an older python; a small collections/ABC shim plus
stubs for its unused host-utility deps (GPUtil, pathspec) make the model
modules importable on 3.12. If the reference mount or torch model imports
are unavailable the tests skip rather than fail.
"""

import sys
import types
from copy import deepcopy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coot_videotext_tpu.utils.yaml_utils import load_yaml_config_file
from coot_videotext_tpu.utils.general import (
    resolve_sameas_config_recursively)
from coot_videotext_tpu.utils import torch_convert

REF = "/root/reference"
RETRIEVAL_YAML = f"{REF}/config/retrieval/paper2020/yc2_100m_coot.yaml"
CAPTION_YAML = f"{REF}/config/caption/paper2020/yc2_100m_coot_vidclip_mart.yaml"

# feature dims of the yc2_100m setup (reference repo README / config)
INPUT_DIMS = {"net_video_local": 512, "net_video_global": 384,
              "net_text_local": 1536, "net_text_global": 384}


def _import_reference():
    """Import the reference torch model modules with py3.12 shims."""
    import collections
    import collections.abc
    for name in ("Iterable", "Mapping", "Sequence", "Callable",
                 "MutableMapping"):
        setattr(collections, name, getattr(collections.abc, name))
    for fake in ("GPUtil", "pathspec"):
        if fake not in sys.modules:
            sys.modules[fake] = types.ModuleType(fake)
    if not hasattr(sys.modules["pathspec"], "PathSpec"):
        sys.modules["pathspec"].PathSpec = type("PathSpec", (), {})
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from nntrainer.models import transformer_legacy  # noqa: F401
        from mart import model as mart_model  # noqa: F401
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference torch models not importable: {exc}")
    return transformer_legacy, mart_model


@pytest.fixture(scope="module")
def reference():
    return _import_reference()


@pytest.mark.parametrize("net_name",
                         ["net_video_local", "net_video_global",
                          "net_text_local", "net_text_global"])
def test_coot_net_golden_parity(reference, net_name):
    """Torch TransformerLegacy forward == converted flax CootTransformer."""
    import torch
    transformer_legacy, _ = reference
    from coot_videotext_tpu.models.configs import (
        TransformerConfig as OurTC)
    from coot_videotext_tpu.models.transformer import CootTransformer

    cfg_dict = load_yaml_config_file(RETRIEVAL_YAML)
    resolve_sameas_config_recursively(cfg_dict)
    d_in = INPUT_DIMS[net_name]

    ref_cfg = transformer_legacy.TransformerConfig(
        deepcopy(cfg_dict[net_name]))
    torch.manual_seed(0)
    ref_net = transformer_legacy.TransformerLegacy(ref_cfg, d_in).eval()

    our_cfg = OurTC(deepcopy(cfg_dict[net_name]))
    our_net = CootTransformer(cfg=our_cfg)

    b, length = 3, 7
    rng = np.random.RandomState(0)
    feats = rng.randn(b, length, d_in).astype(np.float32)
    lengths = np.array([7, 5, 3], dtype=np.int64)
    valid = np.arange(length)[None, :] < lengths[:, None]
    hidden = None
    if our_cfg.use_context:
        hidden = rng.randn(b, our_cfg.selfatn.hidden_dim).astype(np.float32)

    with torch.no_grad():
        # reference mask convention: 1 = PADDED (transformer_legacy.py:207)
        tp, tseq = ref_net(
            torch.from_numpy(feats), torch.from_numpy(~valid),
            torch.from_numpy(lengths),
            torch.from_numpy(hidden) if hidden is not None else None)
    tp, tseq = tp.numpy(), tseq.numpy()

    flat = torch_convert.convert_coot_net(
        {k: v.numpy() for k, v in ref_net.state_dict().items()})
    template = our_net.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(feats),
        jnp.asarray(valid), jnp.asarray(lengths),
        jnp.asarray(hidden) if hidden is not None else None,
        deterministic=True)["params"]
    params = torch_convert.apply_converted(template, flat)
    op, oseq = our_net.apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray(valid),
        jnp.asarray(lengths),
        jnp.asarray(hidden) if hidden is not None else None,
        deterministic=True)
    np.testing.assert_allclose(np.asarray(op), tp, atol=2e-5)
    np.testing.assert_allclose(np.asarray(oseq), tseq, atol=2e-5)


def test_mart_golden_parity(reference):
    """Torch RecursiveTransformer == converted flax RecursiveTransformer."""
    import torch
    _, mart_model = reference
    from coot_videotext_tpu.tasks.caption.config import MartConfig
    from coot_videotext_tpu.tasks.caption.model_manager import (
        create_mart_model)

    vocab = 130
    cfg = MartConfig(load_yaml_config_file(CAPTION_YAML))
    # shrink dims: converter/key-layout parity is size-independent, and
    # the full hidden-768 model costs ~35s of CPU trace+forward
    cfg.hidden_size = 96
    cfg.intermediate_size = 96
    cfg.num_attention_heads = 4
    cfg.word_vec_size = 48
    cfg.video_feature_size = 64
    model = create_mart_model(cfg, vocab_size=vocab, verbose=False)

    ref_cfg = types.SimpleNamespace(
        hidden_size=cfg.hidden_size, vocab_size=vocab,
        word_vec_size=cfg.word_vec_size,
        video_feature_size=cfg.video_feature_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_dropout_prob=cfg.hidden_dropout_prob,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        attention_probs_dropout_prob=cfg.attention_probs_dropout_prob,
        intermediate_size=cfg.intermediate_size,
        n_memory_cells=cfg.n_memory_cells,
        memory_dropout_prob=cfg.memory_dropout_prob,
        share_wd_cls_weight=cfg.share_wd_cls_weight,
        label_smoothing=cfg.label_smoothing,
        initializer_range=cfg.initializer_range,
        max_v_len=cfg.max_v_len, max_t_len=cfg.max_t_len)
    torch.manual_seed(0)
    ref = mart_model.RecursiveTransformer(ref_cfg).eval()

    s, n = 2, 3
    length = cfg.max_v_len + cfg.max_t_len
    rng = np.random.RandomState(0)
    ids = rng.randint(0, vocab, (s, n, length)).astype(np.int64)
    vids = rng.randn(s, n, length,
                     cfg.video_feature_size).astype(np.float32)
    masks = (rng.rand(s, n, length) > 0.2).astype(np.float32)
    tokty = np.concatenate(
        [np.zeros((s, n, cfg.max_v_len)),
         np.ones((s, n, cfg.max_t_len))], -1).astype(np.int64)
    labels = rng.randint(-1, vocab, (s, n, length)).astype(np.int64)

    with torch.no_grad():
        tloss, tscores = ref(
            [torch.from_numpy(ids[i]) for i in range(s)],
            [torch.from_numpy(vids[i]) for i in range(s)],
            [torch.from_numpy(masks[i]) for i in range(s)],
            [torch.from_numpy(tokty[i]) for i in range(s)],
            [torch.from_numpy(labels[i]) for i in range(s)])
    tscores = np.stack([t.numpy() for t in tscores])

    flat = torch_convert.convert_mart_model_state(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    template = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(ids),
        jnp.asarray(vids), jnp.asarray(masks), jnp.asarray(tokty),
        jnp.asarray(labels), deterministic=True)["params"]
    params = torch_convert.apply_converted(template, flat)
    oloss, oscores = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(vids),
        jnp.asarray(masks), jnp.asarray(tokty), jnp.asarray(labels),
        deterministic=True)
    np.testing.assert_allclose(np.asarray(jnp.stack(list(oscores))),
                               tscores, atol=3e-5)
    assert abs(float(oloss) - float(tloss)) < 2e-3


def test_full_retrieval_pth_roundtrip(reference, tmp_path):
    """A 4-net model_<ep>.pth converts into a full RetrievalModel tree."""
    import torch
    transformer_legacy, _ = reference
    from coot_videotext_tpu.tasks.retrieval.config import RetrievalConfig
    from coot_videotext_tpu.tasks.retrieval.model_manager import (
        RetrievalModelManager, build_dummy_retrieval_batch)

    cfg_dict = load_yaml_config_file(RETRIEVAL_YAML)
    resolved = deepcopy(cfg_dict)
    resolve_sameas_config_recursively(resolved)
    state = {}
    torch.manual_seed(0)
    for net_name, d_in in INPUT_DIMS.items():
        ref_cfg = transformer_legacy.TransformerConfig(
            deepcopy(resolved[net_name]))
        net = transformer_legacy.TransformerLegacy(ref_cfg, d_in)
        state[net_name] = net.state_dict()
    pth = tmp_path / "model_0.pth"
    torch.save(state, pth)

    cfg = RetrievalConfig(load_yaml_config_file(RETRIEVAL_YAML))
    mgr = RetrievalModelManager(cfg)
    batch = build_dummy_retrieval_batch(cfg, batch_size=2)
    template = {"params": mgr.init_params(0, batch)}
    converted = torch_convert.convert_model_file(str(pth), template)

    # strict coverage already validated inside; spot-check one leaf value
    w_t = state["net_video_local"][
        "tf.encoder_layers.0.self_attention_layer.sublayer."
        "query_projection.weight"].numpy()
    w_j = np.asarray(
        converted["params"]["net_video_local"]["tf"]["layer_0"]
        ["self_attention"]["query_projection"]["kernel"])
    np.testing.assert_allclose(w_j, w_t.T)


def _ref_cfg_ns2(cfg, vocab):
    """SimpleNamespace with `in` support + the XL extras."""
    ns = types.SimpleNamespace(
        hidden_size=cfg.hidden_size, vocab_size=vocab,
        word_vec_size=cfg.word_vec_size,
        video_feature_size=cfg.video_feature_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_dropout_prob=cfg.hidden_dropout_prob,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        attention_probs_dropout_prob=cfg.attention_probs_dropout_prob,
        intermediate_size=cfg.intermediate_size,
        n_memory_cells=cfg.n_memory_cells,
        memory_dropout_prob=cfg.memory_dropout_prob,
        share_wd_cls_weight=cfg.share_wd_cls_weight,
        label_smoothing=cfg.label_smoothing,
        initializer_range=cfg.initializer_range,
        max_v_len=cfg.max_v_len, max_t_len=cfg.max_t_len,
        xl_grad=getattr(cfg, "xl_grad", False), inf=32752.0)
    cls = type("RefCfg", (types.SimpleNamespace,),
               {"__contains__": lambda self, item: hasattr(self, item)})
    return cls(**vars(ns))


def _small_caption_cfg(reference, flags):
    from coot_videotext_tpu.tasks.caption.config import MartConfig
    cfg_dict = load_yaml_config_file(CAPTION_YAML)
    cfg_dict.update({"hidden_size": 64, "intermediate_size": 64,
                     "num_attention_heads": 4, "word_vec_size": 32,
                     "video_feature_size": 48, **flags})
    return MartConfig(cfg_dict)


def _untied_inputs(cfg, vocab, n, seed):
    rng = np.random.RandomState(seed)
    vids = rng.randn(n, cfg.max_v_len,
                     cfg.video_feature_size).astype(np.float32)
    vmask = (rng.rand(n, cfg.max_v_len) > 0.2).astype(np.float32)
    tids = rng.randint(0, vocab, (n, cfg.max_t_len)).astype(np.int64)
    tmask = (rng.rand(n, cfg.max_t_len) > 0.2).astype(np.float32)
    labels = rng.randint(-1, vocab, (n, cfg.max_t_len)).astype(np.int64)
    return vids, vmask, tids, tmask, labels


def test_untied_golden_parity(reference):
    """Torch NonRecurTransformerUntied == converted flax untied model."""
    import torch
    _, mart_model = reference
    from coot_videotext_tpu.tasks.caption.model_manager import (
        create_mart_model)

    vocab = 120
    cfg = _small_caption_cfg(reference,
                             {"recurrent": False, "untied": True})
    assert cfg.model_type == "untied_single"
    model = create_mart_model(cfg, vocab_size=vocab, verbose=False)
    torch.manual_seed(0)
    ref = mart_model.NonRecurTransformerUntied(
        _ref_cfg_ns2(cfg, vocab)).eval()

    n = 3
    vids, vmask, tids, tmask, labels = _untied_inputs(cfg, vocab, n, 0)
    with torch.no_grad():
        # the reference's NonRecurTransformerUntied.decode (model.py:1312)
        # passes diagonal_mask= to a decoder whose kwarg is _diagonal_mask
        # (model.py:700) — its released forward() crashes; replicate the
        # intended flow with positional args instead
        enc = ref.encode(torch.from_numpy(vids), torch.from_numpy(vmask))
        dec = ref.decoder(ref.embeddings(torch.from_numpy(tids)),
                          torch.from_numpy(tmask), enc,
                          torch.from_numpy(vmask), True)[-1]
        tscores = ref.decoder_classifier(dec)
        tloss = ref.loss_func(tscores.view(-1, vocab),
                              torch.from_numpy(labels).view(-1))

    flat = torch_convert.convert_mart_model_state(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    template = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(vids),
        jnp.asarray(vmask), jnp.asarray(tids), jnp.asarray(tmask),
        jnp.asarray(labels), deterministic=True)["params"]
    params = torch_convert.apply_converted(template, flat)
    oloss, oscores = model.apply(
        {"params": params}, jnp.asarray(vids), jnp.asarray(vmask),
        jnp.asarray(tids), jnp.asarray(tmask), jnp.asarray(labels),
        deterministic=True)
    np.testing.assert_allclose(np.asarray(oscores), tscores.numpy(),
                               atol=3e-5)
    assert abs(float(oloss) - float(tloss)) < 2e-3


def test_xl_golden_parity(reference):
    """Torch TransformerXL == converted flax XL (single sentence step)."""
    import torch
    _, mart_model = reference
    from coot_videotext_tpu.tasks.caption.model_manager import (
        create_mart_model)

    vocab = 120
    cfg = _small_caption_cfg(reference, {"xl": True})
    assert cfg.model_type == "xl"
    model = create_mart_model(cfg, vocab_size=vocab, verbose=False)
    torch.manual_seed(0)
    ref = mart_model.TransformerXL(_ref_cfg_ns2(cfg, vocab)).eval()
    # r_w_bias/r_r_bias are uninitialized memory in the reference (see
    # test_translator_parity.py) — define them for reproducibility
    with torch.no_grad():
        ref.encoder.r_w_bias.normal_(0, cfg.initializer_range)
        ref.encoder.r_r_bias.normal_(0, cfg.initializer_range)

    s, n = 2, 3
    length = cfg.max_v_len + cfg.max_t_len
    rng = np.random.RandomState(0)
    ids = rng.randint(0, vocab, (s, n, length)).astype(np.int64)
    vids = rng.randn(s, n, length,
                     cfg.video_feature_size).astype(np.float32)
    masks = np.ones((s, n, length), np.float32)
    tokty = np.concatenate(
        [np.zeros((s, n, cfg.max_v_len)),
         np.ones((s, n, cfg.max_t_len))], -1).astype(np.int64)
    labels = rng.randint(-1, vocab, (s, n, length)).astype(np.int64)

    with torch.no_grad():
        tloss, tscores = ref(
            [torch.from_numpy(ids[i]) for i in range(s)],
            [torch.from_numpy(vids[i]) for i in range(s)],
            [torch.from_numpy(masks[i]) for i in range(s)],
            [torch.from_numpy(tokty[i]) for i in range(s)],
            [torch.from_numpy(labels[i]) for i in range(s)])
    tscores = np.stack([t.numpy() for t in tscores])

    flat = torch_convert.convert_mart_model_state(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    template = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(ids),
        jnp.asarray(vids), jnp.asarray(masks), jnp.asarray(tokty),
        jnp.asarray(labels), deterministic=True)["params"]
    params = torch_convert.apply_converted(template, flat)
    oloss, oscores = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(vids),
        jnp.asarray(masks), jnp.asarray(tokty), jnp.asarray(labels),
        deterministic=True)
    np.testing.assert_allclose(np.asarray(jnp.stack(list(oscores))),
                               tscores, atol=5e-5)
    assert abs(float(oloss) - float(tloss)) < 2e-3


def test_mtrans_golden_parity(reference):
    """Torch MTransformer == converted flax MTransformer."""
    import torch
    from mart.masked_transformer import MTransformer as RefMTransformer
    from coot_videotext_tpu.tasks.caption.model_manager import (
        create_mart_model)

    vocab = 120
    cfg = _small_caption_cfg(reference,
                             {"recurrent": False, "mtrans": True})
    assert cfg.model_type == "mtrans_single"
    model = create_mart_model(cfg, vocab_size=vocab, verbose=False)
    torch.manual_seed(0)
    ref = RefMTransformer(_ref_cfg_ns2(cfg, vocab)).eval()

    n = 3
    vids, vmask, tids, tmask, labels = _untied_inputs(cfg, vocab, n, 1)
    # mtrans applies the causal mask internally; keep text fully valid
    tmask = np.ones_like(tmask)
    with torch.no_grad():
        tloss, tscores = ref(
            torch.from_numpy(vids), torch.from_numpy(vmask),
            torch.from_numpy(tids), torch.from_numpy(tmask),
            torch.from_numpy(labels))

    flat = torch_convert.convert_mart_model_state(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    template = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(vids),
        jnp.asarray(vmask), jnp.asarray(tids), jnp.asarray(tmask),
        jnp.asarray(labels), deterministic=True)["params"]
    params = torch_convert.apply_converted(template, flat)
    oloss, oscores = model.apply(
        {"params": params}, jnp.asarray(vids), jnp.asarray(vmask),
        jnp.asarray(tids), jnp.asarray(tmask), jnp.asarray(labels),
        deterministic=True)
    np.testing.assert_allclose(np.asarray(oscores), tscores.numpy(),
                               atol=5e-5)
    assert abs(float(oloss) - float(tloss)) < 2e-3


def test_convert_checkpoint_cli_mtrans(reference, tmp_path, monkeypatch):
    """convert_checkpoint.py converts a non-recurrent (mtrans) caption
    .pth end-to-end using the shipped mtrans config (vocab detected from
    the tied output matrix; untied-layout template init)."""
    import torch
    from mart.masked_transformer import MTransformer as RefMTransformer

    yaml_path = ("config/caption/paper2020/"
                 "yc2_100m_coot_vidclip_mtrans.yaml")
    from coot_videotext_tpu.tasks.caption.config import MartConfig
    cfg = MartConfig(load_yaml_config_file(yaml_path))
    # shrink the reference model for test speed; the config drives OUR
    # template, so mirror the same dims through an override yaml
    small = load_yaml_config_file(yaml_path)
    small.update({"hidden_size": 64, "intermediate_size": 64,
                  "num_attention_heads": 4, "word_vec_size": 32,
                  "video_feature_size": 48, "use_glove": False})
    from coot_videotext_tpu.utils import yaml_utils
    small_yaml = tmp_path / "mtrans_small.yaml"
    yaml_utils.dump_yaml_config_file(str(small_yaml), small)
    cfg = MartConfig(load_yaml_config_file(str(small_yaml)))

    vocab = 90
    torch.manual_seed(0)
    ref = RefMTransformer(_ref_cfg_ns2(cfg, vocab)).eval()
    pth = tmp_path / "model_3.pth"
    torch.save({"model": ref.state_dict()}, pth)

    out_dir = tmp_path / "converted"
    import convert_checkpoint
    monkeypatch.setattr(
        sys, "argv",
        ["convert_checkpoint.py", str(pth), "-c", str(small_yaml),
         "-o", str(out_dir)])
    convert_checkpoint.main()

    from coot_videotext_tpu.train import checkpoint as ckpt
    state = ckpt.restore_pytree(str(out_dir))
    k = np.asarray(state["params"]["out_kernel"])
    np.testing.assert_allclose(
        k, ref.state_dict()["decoder.out.weight"].numpy().T)
