"""
End-to-end retrieval tests on synthetic data over the 8-device CPU mesh:
dataset build -> bucketed collation -> SPMD train step -> on-device eval ->
checkpoint -> resume. Mirrors the reference's integration_train.py contract
(train, delete trainer, resume from checkpoint, final inference reload).
"""

import numpy as np
import pytest

from coot_videotext_tpu.data.retrieval_dataset import (
    create_retrieval_datasets_and_loaders)
from coot_videotext_tpu.data.synthetic import generate_retrieval_dataset
from coot_videotext_tpu.tasks.retrieval.config import RetrievalConfig
from coot_videotext_tpu.tasks.retrieval.model_manager import (
    RetrievalModelManager)
from coot_videotext_tpu.tasks.retrieval.trainer import RetrievalTrainer

from tests.helpers import retrieval_config_dict


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    overrides = generate_retrieval_dataset(
        root, num_videos=24, num_val_videos=8, vid_feat_dim=64,
        text_feat_dim=48, mean_clips=3.0, max_clips=5, seed=0)
    return root, overrides


def make_cfg(overrides, **kwargs):
    return RetrievalConfig(retrieval_config_dict(overrides, **kwargs))


def test_dataset_and_collation(synth_data):
    root, overrides = synth_data
    cfg = make_cfg(overrides)
    # dense path (no device store)
    train_set, val_set, train_loader, val_loader = \
        create_retrieval_datasets_and_loaders(cfg, root, seed=0,
                                              device_preload=False)
    assert len(train_set) == 24 and len(val_set) == 8
    batch = next(iter(train_loader))
    b = cfg.train.batch_size
    assert batch["vid_feat"].shape[0] == b
    assert batch["clip_feat"].ndim == 4
    # masks consistent with lengths
    assert (batch["vid_mask"].sum(-1) == batch["vid_len"]).all()
    assert (batch["clip_mask"].sum(-1) == batch["clip_len"]).all()
    assert (batch["clip_valid"].sum(-1) == batch["clip_num"]).all()
    # clips and sentences 1:1
    assert (batch["clip_num"] == batch["sent_num"]).all()
    assert batch["batch_valid"].all()


def test_auto_store_decision_hbm_and_dtype_aware(synth_data, monkeypatch):
    """The 'auto' device-preload decision must size the estimate with the
    ACTUAL store itemsize (bf16 halves it vs f32) and compare against the
    device's free-HBM budget (flat 6GB fallback without stats)."""
    import coot_videotext_tpu.data.retrieval_dataset as rd

    class Dev:
        @staticmethod
        def memory_stats():
            return {"bytes_limit": 16_000_000_000,
                    "bytes_in_use": 1_000_000_000}

    assert rd.device_store_budget(Dev()) == 0.55 * 15_000_000_000

    class NoStats:
        @staticmethod
        def memory_stats():
            return None

    assert rd.device_store_budget(NoStats()) == 6e9

    root, overrides = synth_data
    cfg = make_cfg(overrides)
    bf16 = rd.estimate_store_bytes(
        rd.RetrievalDataset(cfg.dataset_train, root,
                            rng=np.random.RandomState(0)), 2)
    val_bf16 = rd.estimate_store_bytes(
        rd.RetrievalDataset(cfg.dataset_val, root,
                            rng=np.random.RandomState(1)), 2)
    # budget between the total bf16 and f32 estimates: bf16 -> store on,
    # f32 (2x the elements' bytes) -> off
    monkeypatch.setattr(rd, "device_store_budget",
                        lambda: 1.5 * (bf16 + val_bf16))
    cfg_f32 = make_cfg(overrides)
    assert str(getattr(cfg_f32, "compute_dtype", "float32")) == "float32"
    *_, loader_f32 = rd.create_retrieval_datasets_and_loaders(
        cfg_f32, root, seed=0)
    assert loader_f32.device_store is None
    cfg_bf16 = make_cfg(overrides)
    cfg_bf16.compute_dtype = "bfloat16"
    *_, loader_bf16 = rd.create_retrieval_datasets_and_loaders(
        cfg_bf16, root, seed=0)
    assert loader_bf16.device_store is not None


def test_device_store_collation_matches_dense(synth_data):
    """The HBM-store index batch gathers to the same features as the
    dense collation (same sampling RNG stream)."""
    import jax
    from coot_videotext_tpu.data.device_store import (
        RetrievalDeviceStore, gather_dense_batch)
    root, overrides = synth_data
    cfg = make_cfg(overrides)
    _, _, loader_a, _ = create_retrieval_datasets_and_loaders(
        cfg, root, seed=0, device_preload=False)
    _, _, loader_b, _ = create_retrieval_datasets_and_loaders(
        cfg, root, seed=0, device_preload=True)
    store = loader_b.device_store
    assert store is not None and store.nbytes > 0
    dense = next(iter(loader_a))
    idx_batch = next(iter(loader_b))
    assert "vid_idx" in idx_batch and "vid_feat" not in idx_batch
    gathered = gather_dense_batch(
        jax.device_put({k: v for k, v in idx_batch.items()
                        if not isinstance(v, list)}),
        store.vid_store, store.text_store)
    # compare only valid (unmasked) positions: padded gather slots point
    # at row 0 and are masked out downstream
    vm = dense["vid_mask"][..., None]
    np.testing.assert_allclose(
        np.asarray(gathered["vid_feat"], np.float32) * vm,
        dense["vid_feat"] * vm, rtol=1e-2, atol=1e-2)
    cm = dense["clip_mask"][..., None]
    np.testing.assert_allclose(
        np.asarray(gathered["clip_feat"], np.float32) * cm,
        dense["clip_feat"] * cm, rtol=1e-2, atol=1e-2)
    np.testing.assert_array_equal(np.asarray(gathered["vid_mask"]),
                                  dense["vid_mask"])
    np.testing.assert_array_equal(np.asarray(gathered["clip_valid"]),
                                  dense["clip_valid"])


def test_train_eval_checkpoint_resume(synth_data, tmp_path):
    root, overrides = synth_data
    log_dir = str(tmp_path / "experiments")
    cfg = make_cfg(overrides, num_epochs=2)
    _, _, train_loader, val_loader = \
        create_retrieval_datasets_and_loaders(cfg, root, seed=0)

    mgr = RetrievalModelManager(cfg)
    trainer = RetrievalTrainer(cfg, mgr, "default", "synthtest", "run1",
                               len(train_loader), log_dir=log_dir)
    trainer.train_model(train_loader, val_loader)
    assert trainer.state.current_epoch == 2
    first_losses = [v for _, v in
                    trainer.metrics.storage_epoch["val_base/loss"]]
    assert len(first_losses) == 2
    assert np.isfinite(first_losses).all()
    # loss went down on the learnable synthetic data
    assert first_losses[-1] < first_losses[0] * 1.05
    ckpts = trainer.exp.get_existing_checkpoints()
    trainer.close()
    del trainer, mgr

    # resume for 1 more epoch
    cfg2 = make_cfg(overrides, num_epochs=3)
    mgr2 = RetrievalModelManager(cfg2)
    trainer2 = RetrievalTrainer(cfg2, mgr2, "default", "synthtest", "run1",
                                len(train_loader), log_dir=log_dir)
    assert trainer2.load and trainer2.load_ep == max(ckpts)
    assert trainer2.state.current_epoch == max(ckpts) + 1
    trainer2.train_model(train_loader, val_loader)
    assert trainer2.state.current_epoch == 3
    trainer2.close()
    del trainer2, mgr2

    # inference-only reload of best epoch
    cfg3 = make_cfg(overrides, num_epochs=3)
    mgr3 = RetrievalModelManager(cfg3)
    trainer3 = RetrievalTrainer(cfg3, mgr3, "default", "synthtest", "run1",
                                len(train_loader), log_dir=log_dir,
                                load_best=True, is_test=True)
    loss, score, _ = trainer3.validate_epoch(val_loader, val_clips=True)
    assert np.isfinite(loss)
    assert 0 <= score <= 1
    trainer3.close()


def test_validate_with_embedding_export(synth_data, tmp_path):
    import h5py
    root, overrides = synth_data
    log_dir = str(tmp_path / "experiments")
    cfg = make_cfg(overrides, num_epochs=1)
    _, val_set, train_loader, val_loader = \
        create_retrieval_datasets_and_loaders(cfg, root, seed=0)
    mgr = RetrievalModelManager(cfg)
    trainer = RetrievalTrainer(cfg, mgr, "default", "embtest", "run1",
                               len(train_loader), log_dir=log_dir)
    trainer.validate_epoch(val_loader, val_clips=True, save_embs=True)
    emb_file = trainer.exp.path_embeddings / "embeddings_0.h5"
    assert emb_file.is_file()
    with h5py.File(emb_file, "r") as h5:
        n_val = len(val_set)
        assert h5["vid_emb"].shape[0] == n_val
        assert h5["par_emb"].shape[0] == n_val
        total_clips = int(np.sum(h5["clip_num"]))
        assert h5["clip_emb"].shape[0] == total_clips
        assert h5["sent_emb"].shape[0] == total_clips
        assert len(h5["key"]) == n_val
        # normalized embeddings have unit norm
        norms = np.linalg.norm(np.asarray(h5["vid_emb"]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    trainer.close()


def test_device_sampling_full_pipeline(synth_data, tmp_path):
    """Fully device-resident pipeline: fixed shapes + HBM store + on-device
    sampling (host ships datapoint ids only). Train 1 epoch + validate."""
    root, overrides = synth_data
    log_dir = str(tmp_path / "experiments")
    cfg = make_cfg(overrides, num_epochs=1)
    _, val_set, train_loader, val_loader = \
        create_retrieval_datasets_and_loaders(
            cfg, root, seed=0, fixed_shapes=True, device_preload=True)
    assert train_loader.device_meta is not None
    batch = next(iter(train_loader))
    assert set(batch) >= {"dp_idx", "batch_valid", "key"}
    assert batch["dp_idx"].shape == (cfg.train.batch_size,)

    mgr = RetrievalModelManager(cfg)
    trainer = RetrievalTrainer(cfg, mgr, "default", "devsample", "run1",
                               len(train_loader), log_dir=log_dir)
    trainer.train_model(train_loader, val_loader)
    assert trainer.state.current_epoch == 1
    losses = [v for _, v in
              trainer.metrics.storage_epoch["val_base/loss"]]
    assert np.isfinite(losses).all()
    loss, score, _ = trainer.validate_epoch(val_loader, val_clips=True)
    assert np.isfinite(loss) and 0 <= score <= 1
    trainer.close()


def test_trainer_scan_fused_dispatch(synth_data, tmp_path):
    """train.steps_per_dispatch > 1 routes training through the
    scan-fused program (group dispatch incl. a padded tail group) with
    the same meter/scheduler/checkpoint bookkeeping as per-step mode."""
    root, overrides = synth_data
    log_dir = str(tmp_path / "experiments")
    cfg_dict = retrieval_config_dict(overrides, num_epochs=2)
    cfg_dict["train"]["steps_per_dispatch"] = 2  # 3 steps/epoch -> 2+tail
    cfg = RetrievalConfig(cfg_dict)
    _, _, train_loader, val_loader = \
        create_retrieval_datasets_and_loaders(
            cfg, root, seed=0, fixed_shapes=True, device_preload=True)
    assert train_loader.device_meta is not None

    mgr = RetrievalModelManager(cfg)
    trainer = RetrievalTrainer(cfg, mgr, "default", "scantrain", "run1",
                               len(train_loader), log_dir=log_dir)
    trainer.train_model(train_loader, val_loader)
    assert trainer._train_scans, "scan program was never built"
    assert not trainer._train_steps, "per-step program built needlessly"
    assert trainer.state.current_epoch == 2
    # every real step was booked exactly once (24 videos / batch 8)
    assert trainer.state.total_step == 2 * len(train_loader)
    assert int(trainer.train_state.step) == 2 * len(train_loader)
    losses = [v for _, v in
              trainer.metrics.storage_epoch["val_base/loss"]]
    assert np.isfinite(losses).all()
    train_losses = [v for _, v in
                    trainer.metrics.storage_step["train_base/loss"]]
    assert len(train_losses) == 2 * len(train_loader)
    assert np.isfinite(train_losses).all()
    trainer.close()


def test_trainer_scan_degrades_during_step_warmup(synth_data, tmp_path):
    """A per-step warmup epoch must NOT be scan-fused (a group applies one
    LR to K steps); the trainer dispatches per-step until warmup ends."""
    root, overrides = synth_data
    log_dir = str(tmp_path / "experiments")
    cfg_dict = retrieval_config_dict(overrides, num_epochs=2)
    cfg_dict["train"]["steps_per_dispatch"] = 2
    cfg_dict["lr_scheduler"].update(
        {"warmup_type": "step", "warmup_epochs": 1})
    cfg = RetrievalConfig(cfg_dict)
    _, _, train_loader, val_loader = \
        create_retrieval_datasets_and_loaders(
            cfg, root, seed=0, fixed_shapes=True, device_preload=True)
    mgr = RetrievalModelManager(cfg)
    trainer = RetrievalTrainer(cfg, mgr, "default", "scanwarm", "run1",
                               len(train_loader), log_dir=log_dir)
    trainer.train_model(train_loader, val_loader)
    # epoch 0 (warmup) used the per-step program, epoch 1 the scan
    assert trainer._train_steps, "warmup epoch should dispatch per-step"
    assert trainer._train_scans, "post-warmup epoch should scan-fuse"
    assert trainer.state.total_step == 2 * len(train_loader)
    # per-step warmup actually varied the LR within epoch 0
    lrs = [v for _, v in trainer.metrics.storage_step["train_base/lr"]]
    warmup_lrs = lrs[:len(train_loader)]
    assert len(set(warmup_lrs)) > 1
    trainer.close()


def test_packed_parts_match_dense(synth_data):
    """The packed (P, L) part layout produces the same model outputs as
    the dense (B, N, L) layout on all valid positions."""
    import jax
    import jax.numpy as jnp
    from coot_videotext_tpu.data.device_store import (
        device_sample_batch, gather_dense_batch)

    root, overrides = synth_data
    cfg = make_cfg(overrides)
    _, _, loader, _ = create_retrieval_datasets_and_loaders(
        cfg, root, seed=0, fixed_shapes=True, device_preload=True)
    meta = loader.device_meta
    store = loader.device_store
    b = cfg.train.batch_size
    n_parts = meta.shapes["n_parts"]
    dp = jnp.arange(b, dtype=jnp.int32)
    rng = jax.random.PRNGKey(3)

    shapes_dense = {k: v for k, v in meta.shapes.items()
                    if not k.startswith("pack_")}
    # force a real packing budget well under b*n_parts
    counts = np.asarray(meta.tables["clip_num"])[:b]
    budget = int(counts.sum()) + 2
    assert budget < b * n_parts, "fixture must have padding to drop"
    shapes_packed = dict(shapes_dense, pack_clips=budget,
                         pack_sents=budget)

    def run(shapes):
        batch = device_sample_batch(meta.tables, dp, shapes,
                                    meta.max_frames, rng=rng)
        batch = gather_dense_batch(batch, store.vid_store,
                                   store.text_store)
        mgr = RetrievalModelManager(cfg)
        params = mgr.init_params(0)
        out = mgr.model_eval.apply({"params": params}, batch,
                                   deterministic=True)
        return batch, out

    batch_d, out_d = run(shapes_dense)
    batch_p, out_p = run(shapes_packed)
    assert batch_p["clip_feat"].shape[0] == budget
    cv = np.asarray(batch_d["clip_valid"])[..., None]
    sv = np.asarray(batch_d["sent_valid"])[..., None]
    np.testing.assert_allclose(
        np.asarray(out_p["clip_emb"]) * cv,
        np.asarray(out_d["clip_emb"]) * cv, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_p["sent_emb"]) * sv,
        np.asarray(out_d["sent_emb"]) * sv, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_p["vid_emb"]),
                               np.asarray(out_d["vid_emb"]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_p["par_emb"]),
                               np.asarray(out_d["par_emb"]),
                               rtol=2e-5, atol=2e-5)


def test_slab_collation_bit_exact_vs_dense(synth_data):
    """Packed-transfer collation (collate_slab) must reconstruct the dense
    batch BIT-EXACTLY after the on-device gather: same points (same host
    sampling + noise), so every valid position is the same float32 and
    every mask/length array is identical."""
    import jax
    from coot_videotext_tpu.data.device_store import gather_dense_batch
    from coot_videotext_tpu.data.retrieval_dataset import RetrievalDataset

    root, overrides = synth_data
    cfg = make_cfg(overrides)
    ds = RetrievalDataset(cfg.dataset_train, root,
                          rng=np.random.RandomState(0))
    points = [ds[i] for i in range(6)]
    fixed = ds.compute_fixed_shapes()
    dense = ds.collate_fn(points, batch_size=8, fixed_shapes=fixed)
    budgets = ds.compute_slab_budgets(batch_size=8)
    slab = ds.collate_slab(points, batch_size=8, fixed_shapes=fixed,
                           slab_budgets=budgets)
    assert slab["vid_store"].shape[0] == budgets["slab_vid_rows"]
    assert "vid_feat" not in slab

    arrays = {k: v for k, v in slab.items() if not isinstance(v, list)}
    vid_store = arrays.pop("vid_store")
    text_store = arrays.pop("text_store")
    gathered = gather_dense_batch(jax.device_put(arrays),
                                  jax.device_put(vid_store),
                                  jax.device_put(text_store))
    for key in ("vid_mask", "vid_len", "clip_mask", "clip_len",
                "clip_valid", "clip_num", "par_mask", "par_len",
                "sent_mask", "sent_len", "sent_valid", "sent_num",
                "batch_valid"):
        np.testing.assert_array_equal(np.asarray(gathered[key]),
                                      dense[key], err_msg=key)
    for key, mask in (("vid_feat", dense["vid_mask"]),
                      ("clip_feat", dense["clip_mask"]),
                      ("par_feat", dense["par_mask"]),
                      ("sent_feat", dense["sent_mask"])):
        got = np.asarray(gathered[key], np.float32) * mask[..., None]
        np.testing.assert_array_equal(got, dense[key] * mask[..., None],
                                      err_msg=key)


def test_slab_train_and_eval_steps_match_dense(synth_data):
    """A jitted train step and eval step fed slab batches produce the same
    losses/embeddings as the dense path (same params, same points)."""
    import jax
    import jax.numpy as jnp
    from coot_videotext_tpu.data.retrieval_dataset import RetrievalDataset
    from coot_videotext_tpu.tasks.retrieval.steps import (
        TrainState, make_retrieval_eval_step, make_retrieval_train_step)
    from coot_videotext_tpu.train.optim import make_optimizer

    root, overrides = synth_data
    cfg = make_cfg(overrides)
    ds = RetrievalDataset(cfg.dataset_train, root,
                          rng=np.random.RandomState(0))
    points = [ds[i] for i in range(6)]
    fixed = ds.compute_fixed_shapes()
    dense = ds.collate_fn(points, batch_size=8, fixed_shapes=fixed)
    slab = ds.collate_slab(points, batch_size=8, fixed_shapes=fixed)

    mgr = RetrievalModelManager(cfg)
    params = mgr.init_params(0, {k: v for k, v in dense.items()
                                 if not isinstance(v, list)})
    opt = make_optimizer(cfg.optimizer)
    state = TrainState(params, opt.init(params), jnp.int32(0))
    lw = cfg.train.contrastive_loss_config.as_dict()
    kw = dict(loss_weights=lw, margin=cfg.train.contrastive_loss_config.margin,
              loss_cycle_cons=cfg.train.loss_cycle_cons)

    rng = jax.random.PRNGKey(7)
    step_d = make_retrieval_train_step(
        mgr.model_train, opt, clip_gradient=cfg.train.clip_gradient, **kw)
    step_s = make_retrieval_train_step(
        mgr.model_train, opt, clip_gradient=cfg.train.clip_gradient,
        slab=True, **kw)
    db = {k: v for k, v in dense.items() if not isinstance(v, list)}
    sb = {k: v for k, v in slab.items() if not isinstance(v, list)}
    # the train step donates its state arg: give each call its own copy
    copy = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jnp.array(a), t)
    _, m_d = step_d(copy(state), jax.device_put(db), jnp.float32(1e-3), rng)
    _, m_s = step_s(copy(state), jax.device_put(sb), jnp.float32(1e-3), rng)
    np.testing.assert_allclose(float(m_s["loss_total"]),
                               float(m_d["loss_total"]), rtol=1e-6)
    np.testing.assert_allclose(float(m_s["loss_contrastive"]),
                               float(m_d["loss_contrastive"]), rtol=1e-6)

    ev_d = make_retrieval_eval_step(mgr.model_eval, **kw)
    ev_s = make_retrieval_eval_step(mgr.model_eval, slab=True, **kw)
    embs_d, parts_d = ev_d(state.params, jax.device_put(db), rng)
    embs_s, parts_s = ev_s(state.params, jax.device_put(sb), rng)
    np.testing.assert_allclose(np.asarray(embs_s["vid_emb"]),
                               np.asarray(embs_d["vid_emb"]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(embs_s["sent_emb"]),
                               np.asarray(embs_d["sent_emb"]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(parts_s["loss_total"]),
                               float(parts_d["loss_total"]), rtol=1e-6)


def test_pack_transfer_auto_off_on_cpu(synth_data):
    """auto knob: no packed transfers on the CPU backend (nothing to
    shrink), loaders still yield dense batches there."""
    root, overrides = synth_data
    cfg = make_cfg(overrides)
    _, _, train_loader, val_loader = create_retrieval_datasets_and_loaders(
        cfg, root, seed=0, device_preload=False)
    assert not train_loader.pack_transfer
    batch = next(iter(train_loader))
    assert "vid_feat" in batch and "vid_store" not in batch
