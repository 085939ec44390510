"""
End-to-end MART captioning tests on synthetic data over the CPU mesh:
annotation load -> stacked-step collation -> recursive memory transformer ->
BertAdam/EMA train step -> greedy translation -> native caption metrics ->
checkpoint/resume.
"""

import json

import numpy as np
import pytest

from coot_videotext_tpu.data.caption_dataset import (
    create_mart_datasets_and_loaders)
from coot_videotext_tpu.data.synthetic import generate_caption_dataset
from coot_videotext_tpu.tasks.caption.config import MartConfig
from coot_videotext_tpu.tasks.caption.model_manager import (
    MartModelManager, create_mart_model)
from coot_videotext_tpu.tasks.caption.trainer import MartTrainer

from tests.helpers import caption_config_dict


@pytest.fixture(scope="module")
def synth_caption(tmp_path_factory):
    root = tmp_path_factory.mktemp("capdata")
    overrides = generate_caption_dataset(
        root, num_videos=12, num_val_videos=6, coot_dim_vid=64,
        coot_dim_clip=32, mean_sentences=2.0, max_sentences=3, seed=0)
    return root, overrides


def make_setup(overrides, **kwargs):
    kwargs.setdefault("batch_size", 8)
    cfg = MartConfig(caption_config_dict({}, **kwargs))
    train_set, val_set, train_loader, val_loader = \
        create_mart_datasets_and_loaders(
            cfg, overrides["coot_feat_dir"], overrides["annotations_dir"],
            "unused_video_feature_dir", seed=0)
    return cfg, train_set, val_set, train_loader, val_loader


def test_caption_dataset_and_collation(synth_caption):
    root, overrides = synth_caption
    cfg, train_set, val_set, train_loader, val_loader = \
        make_setup(overrides)
    assert len(train_set) == 12 and len(val_set) == 6
    stacked, step_sizes, metas = next(iter(train_loader))
    s, n, length = stacked["input_ids"].shape
    assert length == cfg.max_v_len + cfg.max_t_len
    assert n == cfg.train.batch_size
    assert s >= max(step_sizes)
    assert stacked["video_feature"].shape == (
        s, n, length, cfg.video_feature_size)
    # labels on video positions are IGNORE
    assert (stacked["input_labels"][:, :, :cfg.max_v_len] == -1).all()
    # token types: 0 on video, 1 on text
    assert (stacked["token_type_ids"][:, :, :cfg.max_v_len] == 0).all()
    assert (stacked["token_type_ids"][:, :, cfg.max_v_len:] == 1).all()
    # dummy steps have all-IGNORE labels
    for i, sz in enumerate(step_sizes):
        for step in range(sz, s):
            assert (stacked["input_labels"][step, i] == -1).all()


def test_caption_train_translate_checkpoint(synth_caption, tmp_path):
    root, overrides = synth_caption
    log_dir = str(tmp_path / "experiments")
    cfg, train_set, val_set, train_loader, val_loader = \
        make_setup(overrides, num_epochs=2)
    model = create_mart_model(cfg, len(train_set.word2idx),
                              verbose=False)
    mgr = MartModelManager(cfg, model)
    trainer = MartTrainer(cfg, mgr, "default", "capsynth", "run1",
                          len(train_loader), log_dir=log_dir,
                          annotations_dir=overrides["annotations_dir"])
    trainer.train_model(train_loader, val_loader)
    assert trainer.state.current_epoch == 2

    # translation file written with the reference submission schema
    transl = trainer.exp.get_translation_files(1, "val")
    assert transl.is_file()
    res = json.loads(transl.read_text(encoding="utf8"))
    assert "results" in res and len(res["results"]) == len(val_set)
    one = next(iter(res["results"].values()))
    assert {"sentence", "timestamp", "gt_sentence"} <= set(one[0])

    # caption metrics computed and finite (meteor may be -999)
    cider = [v for _, v in trainer.metrics.storage_epoch["cap/cid"]]
    bleu4 = [v for _, v in trainer.metrics.storage_epoch["cap/b4"]]
    assert len(cider) == 2 and np.isfinite(cider).all()
    assert all(0 <= b <= 1 for b in bleu4)
    # cleanup keeps best+last (epoch 0 deleted when 1 is best and last)
    ckpts = trainer.exp.get_existing_checkpoints()
    assert ckpts and ckpts[-1] == 1
    trainer.close()
    del trainer, mgr, model

    # resume + EMA continues
    cfg2, _, _, train_loader2, val_loader2 = make_setup(overrides,
                                                        num_epochs=3)
    model2 = create_mart_model(cfg2, len(train_set.word2idx),
                               verbose=False)
    mgr2 = MartModelManager(cfg2, model2)
    trainer2 = MartTrainer(cfg2, mgr2, "default", "capsynth", "run1",
                           len(train_loader2), log_dir=log_dir,
                           annotations_dir=overrides["annotations_dir"])
    assert trainer2.load and trainer2.state.current_epoch == 2
    assert trainer2.train_state.ema is not None
    trainer2.train_model(train_loader2, val_loader2)
    assert trainer2.state.current_epoch == 3
    trainer2.close()


def test_caption_bf16_compute():
    """fp16_train: true must resolve to bfloat16 compute (the reference
    disables fp16 MART because torch backward NaNs; on TPU bf16 is safe
    with f32 softmax/loss internals). One bf16 train step stays finite
    and tracks the f32 loss from identical init."""
    import jax
    import jax.numpy as jnp
    from coot_videotext_tpu.tasks.caption.model_manager import (
        build_dummy_caption_batch)
    from coot_videotext_tpu.tasks.caption.steps import (
        init_caption_train_state, make_caption_train_step)
    from coot_videotext_tpu.train.optim import make_bertadam

    from copy import deepcopy

    cfg32 = MartConfig(deepcopy(
        caption_config_dict({}, batch_size=4, num_epochs=1)))
    cfg16 = MartConfig(caption_config_dict(
        {"fp16_train": True, "fp16_val": True}, batch_size=4,
        num_epochs=1))
    vocab = 32
    m32 = create_mart_model(cfg32, vocab, verbose=False)
    m16 = create_mart_model(cfg16, vocab, verbose=False)
    assert m32.dtype == jnp.float32
    assert m16.dtype == jnp.bfloat16

    batch = build_dummy_caption_batch(cfg32, vocab, batch_size=4,
                                      step_size=2)
    rng = np.random.RandomState(0)
    labels = batch["input_labels"].copy()
    labels[:, :, cfg32.max_v_len:] = rng.randint(
        7, vocab, labels[:, :, cfg32.max_v_len:].shape)
    batch["input_labels"] = labels
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    opt = make_bertadam(eps=cfg32.eps)
    losses = {}
    for name, model in (("f32", m32), ("bf16", m16)):
        state = init_caption_train_state(
            model, opt, jax.random.PRNGKey(0), batch,
            ema_decay=cfg32.ema_decay)
        step = make_caption_train_step(
            model, opt, ema_decay=cfg32.ema_decay, clip_gradient=1.0)
        state, metrics = step(state, batch, jnp.float32(1e-4),
                              jax.random.PRNGKey(1))
        losses[name] = float(metrics["loss"])
        assert np.isfinite(losses[name])
        assert all(np.isfinite(np.asarray(p)).all()
                   for p in jax.tree_util.tree_leaves(state.params))
    np.testing.assert_allclose(losses["bf16"], losses["f32"], rtol=2e-2)


def test_caption_metrics_native():
    """Sanity of the native BLEU/ROUGE/CIDEr on a perfect prediction."""
    from coot_videotext_tpu.tasks.caption.metrics.bleu import Bleu
    from coot_videotext_tpu.tasks.caption.metrics.cider import Cider
    from coot_videotext_tpu.tasks.caption.metrics.rouge import Rouge
    gts = {0: ["the cat sits on the mat"], 1: ["a dog runs fast"]}
    res = {0: ["the cat sits on the mat"], 1: ["a dog runs fast"]}
    bleu, _ = Bleu(4).compute_score(gts, res)
    assert all(b > 0.99 for b in bleu)
    rouge, _ = Rouge().compute_score(gts, res)
    assert rouge > 0.99
    cider, _ = Cider().compute_score(gts, res)
    assert cider > 9.0  # CIDEr scale x10

    res_bad = {0: ["completely unrelated words here"],
               1: ["nothing matches at all"]}
    bleu_bad, _ = Bleu(4).compute_score(gts, res_bad)
    assert bleu_bad[3] < 0.1


@pytest.mark.parametrize("flags", [
    {"xl": True, "recurrent": True},
    {"untied": True, "recurrent": False},
    {"mtrans": True, "recurrent": False},
    {"recurrent": False},  # plain single-sentence joint model
])
def test_caption_variants_train_and_translate(synth_caption, tmp_path,
                                              flags):
    """Each model variant trains one epoch and translates."""
    root, overrides = synth_caption
    log_dir = str(tmp_path / "experiments")
    cfg, train_set, val_set, train_loader, val_loader = make_setup(
        overrides, num_epochs=1, **{"batch_size": 8})
    for k, v in flags.items():
        setattr(cfg, k, v)
    # rebuild loaders with the right collate layout for the flags
    from coot_videotext_tpu.data.caption_dataset import (
        create_mart_datasets_and_loaders)
    train_set, val_set, train_loader, val_loader = \
        create_mart_datasets_and_loaders(
            cfg, overrides["coot_feat_dir"], overrides["annotations_dir"],
            "unused", seed=0)
    model = create_mart_model(cfg, len(train_set.word2idx), verbose=False)
    mgr = MartModelManager(cfg, model)
    name = "_".join(sorted(k for k, v in flags.items() if v)) or "single"
    trainer = MartTrainer(cfg, mgr, "default", f"var_{name}", "run1",
                          len(train_loader), log_dir=log_dir,
                          annotations_dir=overrides["annotations_dir"])
    trainer.train_model(train_loader, val_loader)
    assert trainer.state.current_epoch == 1
    transl = trainer.exp.get_translation_files(0, "val")
    assert transl.is_file()
    res = json.loads(transl.read_text(encoding="utf8"))
    assert len(res["results"]) == len(
        {e["name"] for e in (val_set.data if not cfg.recurrent
                             else [{"name": d["name"]}
                                   for d in val_set.data])})
    # decoded captions must contain ONLY text tokens — a video-region
    # token leaking in means the decode returned the joint sequence
    # instead of ids[:, max_v_len:] (reference translator.py:352)
    for sents in res["results"].values():
        for s in sents:
            for special in ("[VID]", "[CLS]", "[SEP]", "[BOS]", "[PAD]"):
                assert special not in s["sentence"], (
                    flags, s["sentence"])
    trainer.close()


def test_caption_raw_video_features_train_translate(synth_caption,
                                                    tmp_path):
    """Original-MART data path: raw rgb+flow `.npy` video features with
    the duration-CSV frame<->second table (yc2_mart.yaml-style config,
    coot_model_name null, max_v_len covering sampled frames — reference
    recursive_caption_dataset.py:209-226,278-295). Trains one epoch and
    translates."""
    from coot_videotext_tpu.data.synthetic import (
        generate_caption_video_features)
    root, overrides = synth_caption
    vf = generate_caption_video_features(root, seed=0)
    log_dir = str(tmp_path / "experiments")
    cfg = MartConfig(caption_config_dict(
        {"coot_model_name": None, "max_v_len": 8,
         "video_feature_size": vf["video_feature_size"]},
        batch_size=8, num_epochs=1))
    train_set, val_set, train_loader, val_loader = \
        create_mart_datasets_and_loaders(
            cfg, "unused_coot_feat_dir", overrides["annotations_dir"],
            vf["video_feature_dir"], seed=0)
    from coot_videotext_tpu.data.caption_dataset import (
        DataTypesConstCaption)
    assert train_set.data_type == DataTypesConstCaption.VIDEO_FEAT
    assert train_set.frame_to_second  # duration CSV parsed
    # loader concatenates resnet+bn along the feature axis
    feat = train_set._load_mart_video_feature(train_set.data[0]["name"])
    assert feat.shape[1] == vf["video_feature_size"]

    stacked, step_sizes, metas = next(iter(train_loader))
    assert stacked["video_feature"].shape[-1] == vf["video_feature_size"]
    # raw path fills up to max_v_len-2 frame rows (CLS/SEP wrap)
    assert stacked["input_ids"].shape[-1] == cfg.max_v_len + cfg.max_t_len

    model = create_mart_model(cfg, len(train_set.word2idx), verbose=False)
    mgr = MartModelManager(cfg, model)
    trainer = MartTrainer(cfg, mgr, "default", "rawvid", "run1",
                          len(train_loader), log_dir=log_dir,
                          annotations_dir=overrides["annotations_dir"])
    trainer.train_model(train_loader, val_loader)
    assert trainer.state.current_epoch == 1
    transl = trainer.exp.get_translation_files(0, "val")
    assert transl.is_file()
    res = json.loads(transl.read_text(encoding="utf8"))
    assert len(res["results"]) == len(val_set)
    trainer.close()


def test_caption_beam_search(synth_caption, tmp_path):
    """Beam search produces hypotheses for the recurrent model."""
    root, overrides = synth_caption
    log_dir = str(tmp_path / "experiments")
    cfg, train_set, val_set, train_loader, val_loader = make_setup(
        overrides, num_epochs=1)
    cfg.use_beam = True
    cfg.beam_size = 2
    cfg.min_sen_len = 2
    cfg.max_sen_len = cfg.max_t_len - 2
    model = create_mart_model(cfg, len(train_set.word2idx), verbose=False)
    mgr = MartModelManager(cfg, model)
    trainer = MartTrainer(cfg, mgr, "default", "beamtest", "run1",
                          len(train_loader), log_dir=log_dir,
                          annotations_dir=overrides["annotations_dir"])
    loss, score, is_best, metrics = trainer.validate_epoch(val_loader)
    assert np.isfinite(loss)
    transl = trainer.exp.get_translation_files(0, "val")
    res = json.loads(transl.read_text(encoding="utf8"))
    assert len(res["results"]) == len(val_set)
    # every entry decodes to a NON-EMPTY caption: with max_length capped
    # to the text region, beams force-finish instead of returning empty
    # hypotheses even for an untrained model
    for entries in res["results"].values():
        for e in entries:
            assert isinstance(e["sentence"], str)
            assert e["sentence"].strip() != ""
    trainer.close()


def test_beam_force_finish_at_max_length():
    """Beams that never emit [EOS] must still produce hypotheses once the
    decodable region is exhausted (ensure_max_length). Regression: with
    max_length > the number of advance() calls, predictions stayed empty
    and every beam caption decoded to '' (the reference crashes on
    beam.predictions[b][0] in this situation, translator.py:163-165)."""
    from coot_videotext_tpu.tasks.caption.beam_search import BeamSearch

    vocab, beam_size, bsz = 11, 2, 3
    eos = 5
    beam = BeamSearch(beam_size, bsz, 0, 4, eos, 1, min_length=5,
                      max_length=8, block_ngram_repeat=0,
                      exclusion_tokens=set())
    rng = np.random.RandomState(0)
    steps = 0
    while not beam.done and steps < 30:
        n_alive = beam.alive_seq.shape[0]
        lp = rng.randn(n_alive, vocab).astype(np.float32)
        lp[:, eos] = -50.0  # EOS never competitive
        beam.advance(lp)
        steps += 1
        if beam.is_finished.any():
            beam.update_finished()
    assert beam.done and steps == 8  # forced at max_length
    for b in range(bsz):
        assert len(beam.predictions[b]) >= 1
        assert len(beam.predictions[b][0]) == 8  # full-length hypothesis
