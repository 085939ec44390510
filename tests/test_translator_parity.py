"""
Token-for-token decode parity against the reference's OWN torch
Translator (mart/translator.py): build a seeded reference torch model,
convert its weights into the flax model (utils/torch_convert.py — forward
parity separately proven in test_torch_convert.py), run BOTH translators
on the same batch, and require the emitted token ids to be IDENTICAL.

This pins the whole greedy decode contract — video-only input blanking,
BOS feeding, full-forward-per-token readout at dec_idx, UNK suppression,
EOS re-masking, and the extra memory-building forward between sentence
steps — so decode regressions (e.g. the round-1 single-sentence bug of
returning the joint sequence) cannot silently reappear.
"""

import types
from copy import deepcopy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coot_videotext_tpu.utils.yaml_utils import load_yaml_config_file
from coot_videotext_tpu.utils import torch_convert

from tests.test_torch_convert import CAPTION_YAML, _import_reference

UNK_ID = 6  # [UNK] token id (reference recursive_caption_dataset)


@pytest.fixture(scope="module")
def reference():
    return _import_reference()


class _RefCfg(types.SimpleNamespace):
    """The reference models probe configs with `"key" in cfg`
    (mart/model.py:1344); give the namespace membership semantics."""

    def __contains__(self, item):
        return hasattr(self, item)


def _ref_cfg_namespace(cfg, vocab):
    return _RefCfg(
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
        # Translator-level knobs (beam path)
        beam_size=2, n_best=1, min_sen_len=5, max_sen_len=10,
        block_ngram_repeat=0, length_penalty_name="none",
        length_penalty_alpha=0.0, use_cuda=False)


def _decode_inputs(cfg, vocab, s, n, seed=0):
    """Joint-sequence batches shaped like the recurrent dataset output:
    video prefix [CLS][VID]*[SEP] region + text region (blanked by the
    translators before decoding)."""
    rng = np.random.RandomState(seed)
    length = cfg.max_v_len + cfg.max_t_len
    ids = rng.randint(7, vocab, (s, n, length)).astype(np.int64)
    vids = rng.randn(s, n, length,
                     cfg.video_feature_size).astype(np.float32)
    masks = np.ones((s, n, length), np.float32)
    # some video padding for realism (mask convention 1=valid)
    masks[:, 0, cfg.max_v_len - 1] = 0
    tokty = np.concatenate(
        [np.zeros((s, n, cfg.max_v_len)),
         np.ones((s, n, cfg.max_t_len))], -1).astype(np.int64)
    return ids, vids, masks, tokty


def _build_recurrent_pair(reference, vocab=130, seed=0, overrides=None):
    """(torch RecursiveTransformer, flax model, converted params, cfg)."""
    import torch
    _, mart_model = reference
    from coot_videotext_tpu.tasks.caption.config import MartConfig
    from coot_videotext_tpu.tasks.caption.model_manager import (
        create_mart_model)

    cfg_dict = load_yaml_config_file(CAPTION_YAML)
    cfg_dict.update(overrides or {})
    cfg = MartConfig(cfg_dict)
    model = create_mart_model(cfg, vocab_size=vocab, verbose=False)
    torch.manual_seed(seed)
    ref = mart_model.RecursiveTransformer(
        _ref_cfg_namespace(cfg, vocab)).eval()

    flat = torch_convert.convert_mart_model_state(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    s, n = 1, 2
    length = cfg.max_v_len + cfg.max_t_len
    dummy = np.zeros((s, n, length), np.int64)
    template = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(dummy),
        jnp.zeros((s, n, length, cfg.video_feature_size), jnp.float32),
        jnp.ones((s, n, length), jnp.float32),
        jnp.asarray(dummy), jnp.asarray(dummy),
        deterministic=True)["params"]
    params = torch_convert.apply_converted(template, flat)
    return ref, model, params, cfg


def test_greedy_recurrent_token_parity(reference):
    """Reference torch greedy recurrent decode == ours, token for token,
    across sentence steps (memory carried between steps)."""
    import torch
    from mart import translator as ref_translator
    from coot_videotext_tpu.tasks.caption.translator import Translator

    ref, model, params, cfg = _build_recurrent_pair(reference)
    vocab = 130
    s, n = 3, 4
    ids, vids, masks, tokty = _decode_inputs(cfg, vocab, s, n)

    tr_ref = ref_translator.Translator(
        ref, _ref_cfg_namespace(cfg, vocab))
    with torch.no_grad():
        ref_out = tr_ref.translate_batch_greedy(
            [torch.from_numpy(ids[i].copy()) for i in range(s)],
            [torch.from_numpy(vids[i]) for i in range(s)],
            [torch.from_numpy(masks[i].copy()) for i in range(s)],
            [torch.from_numpy(tokty[i]) for i in range(s)],
            ref)
    ref_out = [t.numpy() for t in ref_out]

    tr = Translator(model, lambda: params, cfg)
    our_out = tr.translate_batch_greedy(ids, vids, masks, tokty)

    assert len(ref_out) == len(our_out) == s
    for i in range(s):
        np.testing.assert_array_equal(
            np.asarray(our_out[i]), ref_out[i],
            err_msg=f"greedy decode diverged at sentence step {i}")


def test_greedy_single_sentence_token_parity(reference):
    """Reference NonRecurTransformer single-sentence greedy == ours."""
    import torch
    _, mart_model = reference
    from mart import translator as ref_translator
    from coot_videotext_tpu.tasks.caption.config import MartConfig
    from coot_videotext_tpu.tasks.caption.model_manager import (
        create_mart_model)
    from coot_videotext_tpu.tasks.caption.translator import Translator

    vocab = 110
    cfg_dict = load_yaml_config_file(CAPTION_YAML)
    cfg_dict["recurrent"] = False
    cfg = MartConfig(cfg_dict)
    assert cfg.model_type == "single"
    model = create_mart_model(cfg, vocab_size=vocab, verbose=False)
    torch.manual_seed(1)
    ref = mart_model.NonRecurTransformer(
        _ref_cfg_namespace(cfg, vocab)).eval()

    flat = torch_convert.convert_mart_model_state(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    n = 4
    length = cfg.max_v_len + cfg.max_t_len
    dummy = np.zeros((n, length), np.int64)
    template = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(dummy),
        jnp.zeros((n, length, cfg.video_feature_size), jnp.float32),
        jnp.ones((n, length), jnp.float32), jnp.asarray(dummy),
        None, deterministic=True)["params"]
    params = torch_convert.apply_converted(template, flat)

    ids, vids, masks, tokty = _decode_inputs(cfg, vocab, 1, n, seed=2)
    ids, vids, masks, tokty = ids[0], vids[0], masks[0], tokty[0]

    tr_ref = ref_translator.Translator(
        ref, _ref_cfg_namespace(cfg, vocab))
    with torch.no_grad():
        ref_out = tr_ref.translate_batch_single_sentence_greedy(
            torch.from_numpy(ids.copy()), torch.from_numpy(vids),
            torch.from_numpy(masks.copy()), torch.from_numpy(tokty),
            ref).numpy()

    tr = Translator(model, lambda: params, cfg)
    our_out = tr.translate_batch_single_sentence_greedy(
        ids, vids, masks, tokty)
    # both return the text region (reference translator.py:352)
    np.testing.assert_array_equal(np.asarray(our_out), ref_out)


def test_beam_recurrent_token_parity(reference, monkeypatch):
    """Reference torch recurrent BEAM decode == ours in reference_compat
    mode, token for token, across sentence steps.

    Config choices keep the comparison deterministic while still covering
    the reference's real control flow:
    - max_v_len=8 puts sequence position 6 (= the UNK token id) inside
      the video region, so the reference's position-axis clobber
      `pred_scores[:, UNK] = -1e10` (translator.py:133) stays a no-op for
      the readout — with the shipped max_v_len=3 it corrupts the
      dec_idx==6 step into uniform logprobs, whose topk tie-breaking is
      backend-dependent and untestable.
    - max_sen_len=12 < max_t_len-2 forces every beam to finish inside
      the token loop (ensure_max_length), so the reference never hits
      its empty-`predictions[b][0]` crash (:163-165).
    """
    import torch
    from mart import translator as ref_translator
    from coot_videotext_tpu.tasks.caption.translator import Translator

    # the reference targets torch<1.8 where integer `torch.div` floors;
    # on modern torch its beam_search.py:352 `torch.div(ids, vocab,
    # out=long_tensor)` raises. Restore the legacy semantics, scoped.
    _orig_div = torch.div

    def _legacy_div(a, b, *args, **kwargs):
        out = kwargs.get("out")
        if (out is not None and "rounding_mode" not in kwargs
                and not torch.is_floating_point(out)):
            kwargs["rounding_mode"] = "floor"
        return _orig_div(a, b, *args, **kwargs)

    monkeypatch.setattr(torch, "div", _legacy_div)

    vocab = 130
    ref, model, params, cfg = _build_recurrent_pair(
        reference, vocab=vocab, seed=3,
        overrides={"max_v_len": 8, "max_sen_len": 12})
    assert cfg.max_v_len > UNK_ID  # see docstring
    s, n = 2, 3
    ids, vids, masks, tokty = _decode_inputs(cfg, vocab, s, n, seed=4)

    tr_ref = ref_translator.Translator(
        ref, _ref_cfg_namespace(cfg, vocab))
    with torch.no_grad():
        ref_out = tr_ref.translate_batch_beam(
            [torch.from_numpy(ids[i].copy()) for i in range(s)],
            [torch.from_numpy(vids[i]) for i in range(s)],
            [torch.from_numpy(masks[i].copy()) for i in range(s)],
            [torch.from_numpy(tokty[i]) for i in range(s)],
            ref, beam_size=cfg.beam_size, n_best=cfg.n_best,
            min_length=cfg.min_sen_len, max_length=cfg.max_sen_len,
            block_ngram_repeat=cfg.block_ngram_repeat,
            exclusion_idxs=set(),
            length_penalty_name=cfg.length_penalty_name,
            length_penalty_alpha=cfg.length_penalty_alpha,
            use_cuda=False)
    ref_out = [t.numpy() for t in ref_out]

    tr = Translator(model, lambda: params, cfg)
    our_out = tr.translate_batch_beam(ids, vids, masks, tokty,
                                      reference_compat=True)

    assert len(ref_out) == len(our_out) == s
    for i in range(s):
        np.testing.assert_array_equal(
            np.asarray(our_out[i]), ref_out[i],
            err_msg=f"beam decode diverged at sentence step {i}")


def test_greedy_xl_token_parity(reference):
    """Reference torch XL greedy decode == ours, token for token, across
    sentence steps (XL memory carried between steps)."""
    import torch
    from mart import translator as ref_translator
    from coot_videotext_tpu.tasks.caption.translator import Translator
    from coot_videotext_tpu.tasks.caption.model_manager import (
        create_mart_model)
    from tests.test_torch_convert import _ref_cfg_ns2, _small_caption_cfg

    _, mart_model = reference
    vocab = 120
    cfg = _small_caption_cfg(reference, {"xl": True})
    model = create_mart_model(cfg, vocab_size=vocab, verbose=False)
    torch.manual_seed(5)
    ref = mart_model.TransformerXL(_ref_cfg_ns2(cfg, vocab)).eval()
    # the reference leaves r_w_bias/r_r_bias as UNINITIALIZED memory
    # (nn.Parameter(torch.Tensor(...)), untouched by init_bert_weights,
    # model.py:1088-1089) — garbage (occasionally inf/NaN) makes decode
    # comparison nondeterministic; give them defined values
    with torch.no_grad():
        ref.encoder.r_w_bias.normal_(0, cfg.initializer_range)
        ref.encoder.r_r_bias.normal_(0, cfg.initializer_range)

    flat = torch_convert.convert_mart_model_state(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    s, n = 3, 4
    ids, vids, masks, tokty = _decode_inputs(cfg, vocab, s, n, seed=6)
    template = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(ids),
        jnp.asarray(vids), jnp.asarray(masks), jnp.asarray(tokty),
        jnp.asarray(ids), deterministic=True)["params"]
    params = torch_convert.apply_converted(template, flat)

    tr_ref = ref_translator.Translator(ref, _ref_cfg_ns2(cfg, vocab))
    with torch.no_grad():
        ref_out = tr_ref.translate_batch_greedy_xl(
            [torch.from_numpy(ids[i].copy()) for i in range(s)],
            [torch.from_numpy(vids[i]) for i in range(s)],
            [torch.from_numpy(masks[i].copy()) for i in range(s)],
            [torch.from_numpy(tokty[i]) for i in range(s)],
            ref)
    ref_out = [t.numpy() for t in ref_out]

    tr = Translator(model, lambda: params, cfg)
    our_out = tr.translate_batch_greedy_xl(ids, vids, masks, tokty)
    assert len(ref_out) == len(our_out) == s
    for i in range(s):
        np.testing.assert_array_equal(
            np.asarray(our_out[i]), ref_out[i],
            err_msg=f"xl greedy decode diverged at sentence step {i}")


def test_greedy_untied_token_parity(reference):
    """Reference untied greedy decode == ours, token for token. The
    reference's released untied path has two bugs its own trainer never
    hits here — `model.cfg` (the untied model stores `config`,
    model.py:1263) and the decode kwarg mismatch (diagonal_mask vs
    _diagonal_mask, :1312/:700) — patched with the intended semantics so
    the decode CONTRACT itself can be pinned."""
    import torch
    from mart import translator as ref_translator
    from coot_videotext_tpu.tasks.caption.translator import Translator
    from coot_videotext_tpu.tasks.caption.model_manager import (
        create_mart_model)
    from tests.test_torch_convert import _ref_cfg_ns2, _small_caption_cfg

    _, mart_model = reference
    vocab = 120
    cfg = _small_caption_cfg(reference,
                             {"recurrent": False, "untied": True})
    model = create_mart_model(cfg, vocab_size=vocab, verbose=False)
    torch.manual_seed(7)
    ref = mart_model.NonRecurTransformerUntied(
        _ref_cfg_ns2(cfg, vocab)).eval()
    ref.cfg = ref.config  # reference bug 1: translator reads model.cfg

    def fixed_decode(text_input_ids, text_masks, text_input_labels,
                     encoder_outputs, encoder_masks):
        # reference bug 2: decode() passes diagonal_mask= to a decoder
        # whose kwarg is _diagonal_mask; call positionally instead
        emb = ref.embeddings(text_input_ids)
        out = ref.decoder(emb, text_masks, encoder_outputs,
                          encoder_masks, True)[-1]
        return None, ref.decoder_classifier(out)

    ref.decode = fixed_decode

    flat = torch_convert.convert_mart_model_state(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    n = 4
    rng = np.random.RandomState(8)
    vids = rng.randn(n, cfg.max_v_len,
                     cfg.video_feature_size).astype(np.float32)
    vmask = np.ones((n, cfg.max_v_len), np.float32)
    vmask[0, -1] = 0
    tids = np.zeros((n, cfg.max_t_len), np.int64)
    tmask = np.zeros((n, cfg.max_t_len), np.float32)
    template = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(vids),
        jnp.asarray(vmask), jnp.asarray(tids), jnp.asarray(tmask),
        jnp.asarray(tids), deterministic=True)["params"]
    params = torch_convert.apply_converted(template, flat)

    with torch.no_grad():
        ref_out = ref_translator.Translator.\
            translate_batch_single_sentence_untied_greedy(
                torch.from_numpy(vids), torch.from_numpy(vmask),
                torch.from_numpy(tids.copy()),
                torch.from_numpy(tmask.copy()), None, ref).numpy()

    tr = Translator(model, lambda: params, cfg)
    our_out = tr.translate_batch_single_sentence_untied_greedy(
        vids, vmask, tids, tmask)
    np.testing.assert_array_equal(np.asarray(our_out), ref_out)
