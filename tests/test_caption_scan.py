"""
Opt-in `recurrent_scan` MART forward (models/caption/mart.py
_forward_scan): steps 1..S-1 compile as ONE nn.scan body instead of S-1
unrolled copies. Deterministic math must be identical to the unroll —
same param tree, loss, per-step scores, and grads (the only sanctioned
divergence is the per-step dropout rng derivation in training mode).
"""

import jax
import jax.numpy as jnp
import numpy as np

from coot_videotext_tpu.tasks.caption.config import MartConfig
from coot_videotext_tpu.tasks.caption.model_manager import (
    build_dummy_caption_batch, create_mart_model)
from tests.helpers import caption_config_dict

VOCAB = 32


def _setup():
    cfg_a = MartConfig(caption_config_dict({}, batch_size=4, num_epochs=1))
    cfg_b = MartConfig(caption_config_dict({"recurrent_scan": True},
                                           batch_size=4, num_epochs=1))
    model_a = create_mart_model(cfg_a, VOCAB, verbose=False)
    model_b = create_mart_model(cfg_b, VOCAB, verbose=False)
    batch = build_dummy_caption_batch(cfg_a, VOCAB, batch_size=4,
                                      step_size=3)
    rng = np.random.RandomState(0)
    labels = batch["input_labels"].copy()
    labels[:, :, cfg_a.max_v_len:] = rng.randint(
        7, VOCAB, labels[:, :, cfg_a.max_v_len:].shape)
    batch["input_labels"] = labels
    args = [jnp.asarray(batch[k]) for k in
            ("input_ids", "video_feature", "input_mask",
             "token_type_ids", "input_labels")]
    return model_a, model_b, args


def test_recurrent_scan_matches_unroll():
    model_a, model_b, args = _setup()
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(0)}
    var_a = model_a.init(rngs, *args, deterministic=True)
    var_b = model_b.init(rngs, *args, deterministic=True)
    # identical parameter trees: checkpoints are interchangeable across
    # the flag
    assert (jax.tree_util.tree_structure(var_a)
            == jax.tree_util.tree_structure(var_b))
    for pa, pb in zip(jax.tree_util.tree_leaves(var_a),
                      jax.tree_util.tree_leaves(var_b)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    loss_a, scores_a = model_a.apply(var_a, *args, deterministic=True)
    loss_b, scores_b = model_b.apply(var_a, *args, deterministic=True)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    assert len(scores_a) == len(scores_b) == 3
    for sa, sb in zip(scores_a, scores_b):
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                   rtol=1e-4, atol=1e-5)

    def loss_fn(model):
        return lambda p: model.apply({"params": p}, *args,
                                     deterministic=True)[0]

    grads_a = jax.grad(loss_fn(model_a))(var_a["params"])
    grads_b = jax.grad(loss_fn(model_b))(var_a["params"])
    for ga, gb in zip(jax.tree_util.tree_leaves(grads_a),
                      jax.tree_util.tree_leaves(grads_b)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-3, atol=1e-5)


def test_fused_greedy_matches_stepwise():
    """The fused whole-batch greedy decode (one dispatch) must emit
    token-for-token identical ids to the per-sentence dispatch loop
    (which tests/test_translator_parity.py pins against the reference's
    own torch Translator)."""
    from coot_videotext_tpu.tasks.caption.translator import Translator

    model, _, args = _setup()
    rngs = {"params": jax.random.PRNGKey(3),
            "dropout": jax.random.PRNGKey(3)}
    variables = model.init(rngs, *args, deterministic=True)
    cfg = model.cfg
    translator = Translator(model, lambda: variables["params"], cfg)

    ids, feats, masks, ttys, _ = args
    out_fused = translator.translate_batch_greedy(
        ids, feats, masks, ttys, fused=True)
    out_step = translator.translate_batch_greedy(
        ids, feats, masks, ttys, fused=False)
    assert len(out_fused) == len(out_step) == ids.shape[0]
    for a, b in zip(out_fused, out_step):
        np.testing.assert_array_equal(a, b)
    # sanity: the decodes contain some non-PAD tokens
    assert any(np.asarray(a).max() > 0 for a in out_fused)
