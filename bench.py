"""
Benchmark: COOT retrieval training throughput (clips/sec/chip).

Workload mirrors the reference's YouCook2 "2d3d" headline config
(config/retrieval/paper2020/yc2_2d3d_coot.yaml: batch 64, max_frames 80,
vid_feat_dim 4096, text_feat_dim 1536, ~7.7 clips+sentences per video,
attention dropout 0.01, frame noise 0.01, RAdam + contrastive +
cycle-consistency losses) on synthetic features through the production
path: HBM-resident feature store + device-side sampling + scan-fused
multi-step dispatch.

Timing methodology: on this environment the TPU is reached through a
tunnel where jax.block_until_ready does NOT synchronize; completion is
forced by fetching a scalar that depends on the updated parameters, and
the per-step time is the difference quotient between a 1-group and an
N-group dispatch chain (cancelling the constant dispatch+fetch latency).

Baseline derivation (no throughput numbers exist in the reference; see
BASELINE.md): README.md:158 reports 1.45 +/- 0.41 h total training
wall-clock for yc2_2d3d on 1 GPU over the 1333-video / ~10.3k-clip train
split for ~80 epochs => ~122 clips/s reference throughput per GPU.
vs_baseline = ours / 122.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_CLIPS_PER_SEC = 122.0


def main() -> None:
    from coot_videotext_tpu.data.retrieval_dataset import (
        create_retrieval_datasets_and_loaders)
    from coot_videotext_tpu.data.synthetic import generate_retrieval_dataset
    from coot_videotext_tpu.parallel.mesh import (
        get_mesh, replicated_sharding)
    from coot_videotext_tpu.tasks.retrieval.config import RetrievalConfig
    from coot_videotext_tpu.tasks.retrieval.model_manager import (
        RetrievalModelManager)
    from coot_videotext_tpu.tasks.retrieval.steps import (
        TrainState, make_retrieval_train_scan)
    from coot_videotext_tpu.train.optim import make_optimizer
    from tests.helpers import retrieval_config_dict

    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    tmp = tempfile.mkdtemp(prefix="coot_bench_")
    overrides = generate_retrieval_dataset(
        Path(tmp), num_videos=192, num_val_videos=8,
        vid_feat_dim=4096, text_feat_dim=1536,
        mean_clips=7.7, max_clips=16, fps=1.0,
        mean_duration_sec=320.0, tokens_per_sentence=18, seed=0)

    cfg_dict = retrieval_config_dict(overrides, batch_size=64,
                                     num_epochs=1)
    # yc2_2d3d network dims (d_local 384 / d_global 768, 8 heads) + bf16
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
    cfg = RetrievalConfig(cfg_dict)

    train_set, _, train_loader, _ = create_retrieval_datasets_and_loaders(
        cfg, tmp, seed=0, fixed_shapes=True, device_preload=True)
    store = train_loader.device_store
    meta = train_loader.device_meta
    print(f"device store: {store.nbytes / 1e9:.2f} GB resident in HBM",
          file=sys.stderr)

    mesh = get_mesh()
    n_chips = mesh.devices.size
    mgr = RetrievalModelManager(cfg)
    params = mgr.init_params(0)
    optimizer = make_optimizer(cfg.optimizer)
    state = TrainState(params, optimizer.init(params), jnp.int32(0))
    state = jax.device_put(state, replicated_sharding(mesh))
    lw = cfg.train.contrastive_loss_config.as_dict()
    sampling = {"shapes": meta.shapes, "max_frames": meta.max_frames}
    scan_step = make_retrieval_train_scan(
        mgr.model_train, optimizer, loss_weights=lw,
        margin=cfg.train.contrastive_loss_config.margin,
        loss_cycle_cons=cfg.train.loss_cycle_cons,
        clip_gradient=-1, mesh=mesh,
        frames_noise=cfg.dataset_train.frames_noise,
        device_sampling=sampling)
    lr = jnp.float32(3.6e-4)

    n_videos = len(train_set)
    bsz = cfg.train.batch_size
    steps_per_epoch = n_videos // bsz
    group_size = 24  # steps per dispatch (8 epochs)

    def group_ids(g):
        rows = []
        for e in range(group_size // steps_per_epoch):
            order = np.arange(n_videos)
            np.random.RandomState(g * 100 + e).shuffle(order)
            rows.append(order[:steps_per_epoch * bsz].reshape(
                steps_per_epoch, bsz))
        return jnp.asarray(np.concatenate(rows), jnp.int32)

    bv = jnp.ones((group_size, bsz), bool)
    rng = jax.random.PRNGKey(0)

    def sync(st):
        # force completion: fetch a value that depends on the new params
        return float(jnp.mean(jax.tree_util.tree_leaves(
            st.params)[0].astype(jnp.float32)))

    # warmup: compile + settle
    state, metrics = scan_step(state, group_ids(0), bv, lr,
                               jax.random.fold_in(rng, 0),
                               store.vid_store, store.text_store,
                               meta.tables)
    sync(state)

    # 1-group chain (captures dispatch+fetch constant)
    t0 = time.perf_counter()
    state, metrics = scan_step(state, group_ids(1), bv, lr,
                               jax.random.fold_in(rng, 1),
                               store.vid_store, store.text_store,
                               meta.tables)
    sync(state)
    t_one = time.perf_counter() - t0

    # N-group chain
    n_groups = 6
    t0 = time.perf_counter()
    for g in range(2, 2 + n_groups):
        state, metrics = scan_step(state, group_ids(g), bv, lr,
                                   jax.random.fold_in(rng, g),
                                   store.vid_store, store.text_store,
                                   meta.tables)
    sync(state)
    t_many = time.perf_counter() - t0

    per_step = (t_many - t_one) / ((n_groups - 1) * group_size)
    loss = float(jax.device_get(metrics["loss_total"][-1]))
    assert np.isfinite(loss), f"non-finite loss {loss}"

    clips_per_step = sum(
        len(train_set.meta[k]["segments"]) for k in train_set.keys) \
        / steps_per_epoch
    clips_per_sec_chip = clips_per_step / per_step / n_chips
    result = {
        "metric": "train_clips_per_sec_per_chip",
        "value": round(clips_per_sec_chip, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec_chip / REFERENCE_CLIPS_PER_SEC,
                             3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
