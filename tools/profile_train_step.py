"""Ablation profiling of the retrieval train step on the real TPU.

Chain-difference timing (same methodology as bench.py): time a 1-group
chain and an N-group chain; the difference quotient cancels dispatch+fetch
latency. Each variant changes one thing vs the bench workload.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import tempfile
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def build(cfg_mutate=None):
    from coot_videotext_tpu.data.retrieval_dataset import (
        create_retrieval_datasets_and_loaders)
    from coot_videotext_tpu.data.synthetic import generate_retrieval_dataset
    from coot_videotext_tpu.parallel.mesh import (
        get_mesh, replicated_sharding)
    from coot_videotext_tpu.tasks.retrieval.config import RetrievalConfig
    from coot_videotext_tpu.tasks.retrieval.model_manager import (
        RetrievalModelManager)
    from coot_videotext_tpu.tasks.retrieval.steps import TrainState
    from coot_videotext_tpu.train.optim import make_optimizer
    from tests.helpers import retrieval_config_dict

    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    tmp = tempfile.mkdtemp(prefix="coot_prof_")
    overrides = generate_retrieval_dataset(
        Path(tmp), num_videos=192, num_val_videos=8,
        vid_feat_dim=4096, text_feat_dim=1536,
        mean_clips=7.7, max_clips=16, fps=1.0,
        mean_duration_sec=320.0, tokens_per_sentence=18, seed=0)
    cfg_dict = retrieval_config_dict(overrides, batch_size=64, num_epochs=1)
    for net in ("net_video_local", "net_text_local"):
        cfg_dict[net].update({"output_dim": 384})
        cfg_dict[net]["input_fc_config"]["output_dim"] = 384
        cfg_dict[net]["selfatn_config"].update(
            {"hidden_dim": 384, "num_heads": 8, "pointwise_ff_dim": 384,
             "dropout": 0.01})
        cfg_dict[net]["pooler_config"].update(
            {"hidden_dim": 768, "num_heads": 2, "dropout": 0.01})
    for net in ("net_video_global", "net_text_global"):
        cfg_dict[net].update({"output_dim": 768})
        cfg_dict[net]["selfatn_config"].update(
            {"hidden_dim": 384, "num_heads": 8, "pointwise_ff_dim": 384,
             "dropout": 0.01})
        cfg_dict[net]["crossatn_config"].update(
            {"hidden_dim": 384, "num_heads": 8, "pointwise_ff_dim": 384,
             "dropout": 0.01})
    cfg_dict["dataset_train"]["max_frames"] = 80
    cfg_dict["dataset_val"]["max_frames"] = 80
    cfg_dict["dataset_train"]["frames_noise"] = 0.01
    cfg_dict["fp16_train"] = True
    cfg_dict["optimizer"]["lr"] = 3.6e-4
    if cfg_mutate:
        cfg_mutate(cfg_dict)
    cfg = RetrievalConfig(cfg_dict)

    train_set, _, train_loader, _ = create_retrieval_datasets_and_loaders(
        cfg, tmp, seed=0, fixed_shapes=True, device_preload=True)
    store = train_loader.device_store
    meta = train_loader.device_meta
    mesh = get_mesh()
    mgr = RetrievalModelManager(cfg)
    params = mgr.init_params(0)
    optimizer = make_optimizer(cfg.optimizer)
    state = TrainState(params, optimizer.init(params), jnp.int32(0))
    state_host = jax.tree_util.tree_map(np.asarray, state)
    return dict(cfg=cfg, train_set=train_set, store=store, meta=meta,
                mesh=mesh, mgr=mgr, optimizer=optimizer,
                state_host=state_host)


GROUP = 24


def group_ids(ctx, g):
    n_videos = len(ctx["train_set"])
    bsz = 64
    steps_per_epoch = n_videos // bsz
    rows = []
    for e in range(GROUP // steps_per_epoch):
        order = np.arange(n_videos)
        np.random.RandomState(g * 100 + e).shuffle(order)
        rows.append(order[:steps_per_epoch * bsz].reshape(
            steps_per_epoch, bsz))
    return jnp.asarray(np.concatenate(rows), jnp.int32)


def time_chain(run, sync, n_groups=5):
    run(0)  # warmup/compile
    sync()
    t0 = time.perf_counter()
    run(1)
    sync()
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    for g in range(2, 2 + n_groups):
        run(g)
    sync()
    t_many = time.perf_counter() - t0
    return (t_many - t_one) / ((n_groups - 1) * GROUP)


def variant_full(ctx, *, frames_noise=0.01, loss_cc=None, dropout=True,
                 mode="train"):
    from coot_videotext_tpu.tasks.retrieval.steps import (
        make_retrieval_train_scan)
    cfg = ctx["cfg"]
    lw = cfg.train.contrastive_loss_config.as_dict()
    lcc = cfg.train.loss_cycle_cons if loss_cc is None else loss_cc
    sampling = {"shapes": ctx["meta"].shapes,
                "max_frames": ctx["meta"].max_frames}
    model = ctx["mgr"].model_train if dropout else ctx["mgr"].model_eval
    scan_step = make_retrieval_train_scan(
        model, ctx["optimizer"], loss_weights=lw,
        margin=cfg.train.contrastive_loss_config.margin,
        loss_cycle_cons=lcc, clip_gradient=-1, mesh=ctx["mesh"],
        frames_noise=frames_noise, device_sampling=sampling)
    from coot_videotext_tpu.parallel.mesh import replicated_sharding
    lr = jnp.float32(3.6e-4)
    bv = jnp.ones((GROUP, 64), bool)
    sv = jnp.ones((GROUP,), bool)
    rng = jax.random.PRNGKey(0)
    state_box = [jax.device_put(ctx["state_host"],
                                replicated_sharding(ctx["mesh"]))]

    def run(g):
        st, _ = scan_step(state_box[0], group_ids(ctx, g), bv, sv, lr,
                          jax.random.fold_in(rng, g),
                          ctx["store"].vid_store, ctx["store"].text_store,
                          ctx["meta"].tables)
        state_box[0] = st

    def sync():
        return float(jnp.mean(jax.tree_util.tree_leaves(
            state_box[0].params)[0].astype(jnp.float32)))

    return time_chain(run, sync)


def variant_forward_only(ctx, *, gather_only=False, sample_only=False,
                         no_noise=False):
    """Scan over GROUP steps of sampling(+gather)(+forward), no grads."""
    from coot_videotext_tpu.data.device_store import (
        device_sample_batch, gather_dense_batch)
    cfg = ctx["cfg"]
    meta = ctx["meta"]
    model = ctx["mgr"].model_eval
    sampling = {"shapes": meta.shapes, "max_frames": meta.max_frames}
    params = jax.device_put(ctx["state_host"].params)
    noise = 0.0 if no_noise else 0.01

    def group_fn(params, dp_idx, rng, vid_store, text_store, tables):
        def body(acc, xs):
            ids, key = xs
            k_sample, k_noise = jax.random.split(key)
            batch = device_sample_batch(
                tables, ids, sampling["shapes"], sampling["max_frames"],
                rng=k_sample, batch_valid=jnp.ones((64,), bool))
            if sample_only:
                s = (jnp.sum(batch["vid_idx"]) + jnp.sum(batch["clip_idx"])
                     ).astype(jnp.float32)
                return acc + s, ()
            batch = gather_dense_batch(
                batch, vid_store, text_store, frames_noise=noise,
                rng=k_noise)
            if gather_only:
                s = sum(jnp.sum(batch[k].astype(jnp.float32)) for k in
                        ("vid_feat", "clip_feat", "par_feat", "sent_feat"))
                return acc + s, ()
            out = model.apply({"params": params}, batch,
                              deterministic=True)
            s = sum(jnp.sum(out[k].astype(jnp.float32)) for k in
                    ("vid_emb", "par_emb", "clip_emb", "sent_emb"))
            return acc + s, ()

        keys = jax.random.split(rng, dp_idx.shape[0])
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), (dp_idx, keys))
        return acc

    jf = jax.jit(group_fn)
    rng = jax.random.PRNGKey(0)
    acc_box = [None]

    def run(g):
        acc_box[0] = jf(params, group_ids(ctx, g),
                        jax.random.fold_in(rng, g),
                        ctx["store"].vid_store, ctx["store"].text_store,
                        meta.tables)

    def sync():
        return float(acc_box[0])

    return time_chain(run, sync)


def main():
    ctx = build()
    res = {}
    res["full"] = variant_full(ctx)
    print(f"full train step:        {res['full']*1e3:8.2f} ms", flush=True)
    res["no_noise"] = variant_full(ctx, frames_noise=0.0)
    print(f"  -frames_noise:        {res['no_noise']*1e3:8.2f} ms",
          flush=True)
    res["no_cc"] = variant_full(ctx, loss_cc=0.0)
    print(f"  -cycle_consistency:   {res['no_cc']*1e3:8.2f} ms", flush=True)
    res["no_dropout"] = variant_full(ctx, dropout=False)
    print(f"  -dropout:             {res['no_dropout']*1e3:8.2f} ms",
          flush=True)
    res["fwd"] = variant_forward_only(ctx)
    print(f"forward only:           {res['fwd']*1e3:8.2f} ms", flush=True)
    res["fwd_no_noise"] = variant_forward_only(ctx, no_noise=True)
    print(f"forward only, no noise: {res['fwd_no_noise']*1e3:8.2f} ms",
          flush=True)
    res["gather"] = variant_forward_only(ctx, gather_only=True)
    print(f"sample+gather+noise:    {res['gather']*1e3:8.2f} ms", flush=True)
    res["sample"] = variant_forward_only(ctx, sample_only=True)
    print(f"sample only:            {res['sample']*1e3:8.2f} ms", flush=True)


if __name__ == "__main__" and (len(sys.argv) < 2):
    main()


def variant_model_only(ctx, *, dropout=True):
    """Scan of fwd+bwd+opt over ONE fixed pre-gathered batch (no per-step
    sampling/gather): isolates model+optimizer cost at real shapes."""
    from coot_videotext_tpu.data.device_store import (
        device_sample_batch, gather_dense_batch)
    from coot_videotext_tpu.parallel.mesh import replicated_sharding
    from coot_videotext_tpu.tasks.retrieval.steps import TrainState
    from coot_videotext_tpu.train.losses import (
        compute_total_retrieval_loss)
    cfg = ctx["cfg"]
    meta = ctx["meta"]
    model = ctx["mgr"].model_train if dropout else ctx["mgr"].model_eval
    optimizer = ctx["optimizer"]
    lw = cfg.train.contrastive_loss_config.as_dict()
    margin = cfg.train.contrastive_loss_config.margin
    lcc = cfg.train.loss_cycle_cons

    @jax.jit
    def make_batch(ids, rng, vid_store, text_store, tables):
        k_sample, k_noise = jax.random.split(rng)
        batch = device_sample_batch(
            tables, ids, meta.shapes, meta.max_frames, rng=k_sample,
            batch_valid=jnp.ones((64,), bool))
        return gather_dense_batch(batch, vid_store, text_store,
                                  frames_noise=0.01, rng=k_noise)

    batch = make_batch(group_ids(ctx, 0)[0], jax.random.PRNGKey(1),
                       ctx["store"].vid_store, ctx["store"].text_store,
                       ctx["meta"].tables)

    def group_fn(state, batch, lr, rng):
        def body(carry, key):
            state = carry
            k_drop, k_cc = jax.random.split(key)

            def loss_fn(params):
                out = model.apply(
                    {"params": params}, batch,
                    deterministic=not dropout,
                    rngs={"dropout": k_drop} if dropout else {})
                visual = {k: out[k] for k in
                          ("vid_emb", "clip_emb", "vid_context",
                           "clip_valid", "clip_num")}
                text = {k: out[k] for k in
                        ("par_emb", "sent_emb", "par_context",
                         "sent_valid", "sent_num")}
                loss, parts = compute_total_retrieval_loss(
                    visual, text, lw, margin, lcc, rng=k_cc,
                    batch_valid=batch["batch_valid"])
                return loss, parts

            (_, parts), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_params, new_opt = optimizer.update(
                grads, state.opt_state, state.params, lr)
            return TrainState(new_params, new_opt, state.step + 1), parts

        keys = jax.random.split(rng, GROUP)
        state, metrics = jax.lax.scan(body, state, keys)
        return state, metrics

    scan_step = jax.jit(group_fn, donate_argnums=(0,))
    lr = jnp.float32(3.6e-4)
    rng = jax.random.PRNGKey(0)
    state_box = [jax.device_put(ctx["state_host"],
                                replicated_sharding(ctx["mesh"]))]

    def run(g):
        st, _ = scan_step(state_box[0], batch, lr,
                          jax.random.fold_in(rng, g))
        state_box[0] = st

    def sync():
        return float(jnp.mean(jax.tree_util.tree_leaves(
            state_box[0].params)[0].astype(jnp.float32)))

    return time_chain(run, sync)


def main2():
    ctx = build()
    res = {}
    res["full"] = variant_full(ctx)
    print(f"full train step:         {res['full']*1e3:8.2f} ms", flush=True)
    res["model_only"] = variant_model_only(ctx)
    print(f"model+opt only (fixed batch): {res['model_only']*1e3:8.2f} ms",
          flush=True)
    res["model_only_det"] = variant_model_only(ctx, dropout=False)
    print(f"model+opt only, no dropout:   "
          f"{res['model_only_det']*1e3:8.2f} ms", flush=True)
    res["fwd"] = variant_forward_only(ctx)
    print(f"sample+gather+forward:   {res['fwd']*1e3:8.2f} ms", flush=True)
    res["gather"] = variant_forward_only(ctx, gather_only=True)
    print(f"sample+gather+noise:     {res['gather']*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "2":
    main2()
