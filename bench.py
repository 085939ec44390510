"""
Benchmark: COOT retrieval training throughput (clips/sec/chip).

Workload mirrors the reference's YouCook2 "2d3d" headline config
(config/retrieval/paper2020/yc2_2d3d_coot.yaml: batch 64, max_frames 80,
vid_feat_dim 4096, text_feat_dim 1536, ~7.7 clips+sentences per video,
RAdam + contrastive + cycle-consistency losses) on synthetic features, so
the full real pipeline (h5 read -> sample -> bucket-collate -> device
transfer -> SPMD train step) is measured end-to-end.

Baseline derivation (no throughput numbers exist in the reference; see
BASELINE.md): README.md:158 reports 1.45 +/- 0.41 h total training
wall-clock for yc2_2d3d on 1 GPU. The provided trainerstate files show
training ran ~60-100 epochs over the 1333-video / ~10.3k-clip train split;
taking 80 epochs / 1.45 h => ~16 videos/s => ~122 clips/s reference
throughput per GPU. vs_baseline = ours / 122.

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
    from coot_videotext_tpu.data.pipeline import prefetch_to_device
    from coot_videotext_tpu.data.synthetic import generate_retrieval_dataset
    from coot_videotext_tpu.parallel.mesh import (
        batch_sharding, get_mesh, replicated_sharding)
    from coot_videotext_tpu.tasks.retrieval.config import RetrievalConfig
    from coot_videotext_tpu.tasks.retrieval.model_manager import (
        RetrievalModelManager)
    from coot_videotext_tpu.tasks.retrieval.steps import (
        TrainState, make_retrieval_train_step)
    from coot_videotext_tpu.train.optim import make_optimizer
    from tests.helpers import retrieval_config_dict

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
    cfg_dict["fp16_train"] = True
    cfg_dict["optimizer"]["lr"] = 3.6e-4
    cfg = RetrievalConfig(cfg_dict)

    train_set, _, train_loader, _ = create_retrieval_datasets_and_loaders(
        cfg, tmp, seed=0, fixed_shapes=True, device_preload=True)
    store = train_loader.device_store
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
    meta = train_loader.device_meta
    sampling = {"shapes": meta.shapes, "max_frames": meta.max_frames}
    step = make_retrieval_train_step(
        mgr.model_train, optimizer, loss_weights=lw,
        margin=cfg.train.contrastive_loss_config.margin,
        loss_cycle_cons=cfg.train.loss_cycle_cons,
        clip_gradient=-1, mesh=mesh, use_store=True,
        frames_noise=cfg.dataset_train.frames_noise,
        device_sampling=sampling)
    sharding = batch_sharding(mesh)
    rng = jax.random.PRNGKey(0)
    lr = jnp.float32(3.6e-4)
    host_step = 0

    # epoch 0 = warmup (compile); epochs 1..N measured whole, no per-step
    # syncs so the prefetch pipeline runs free
    clips_per_epoch = sum(len(train_set.meta[k]["segments"])
                          for k in train_set.keys)
    clips_done = 0
    t_start = None
    n_epochs = 40
    for epoch in range(n_epochs):
        train_loader.set_epoch(epoch)
        for batch, _meta in prefetch_to_device(train_loader,
                                               sharding=sharding):
            state, metrics = step(state, batch, lr,
                                  jax.random.fold_in(rng, host_step),
                                  store.vid_store, store.text_store,
                                  meta.tables)
            host_step += 1
        if epoch == 0:
            jax.block_until_ready(state.params)
            t_start = time.perf_counter()
        else:
            clips_done += clips_per_epoch
    jax.block_until_ready(state.params)
    elapsed = time.perf_counter() - t_start
    loss = float(jax.device_get(metrics["loss_total"]))
    assert np.isfinite(loss), f"non-finite loss {loss}"

    clips_per_sec = clips_done / elapsed
    clips_per_sec_chip = clips_per_sec / n_chips
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
