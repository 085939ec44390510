"""Which submodule dominates model fwd+bwd? Ablate via config mutation."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import tools.profile_train_step as P


def run(name, mutate=None):
    ctx = P.build(mutate)
    per = P.variant_model_only(ctx)
    print(f"{name:44s} {per*1e3:8.2f} ms", flush=True)
    del ctx


def main():
    run("baseline (full model)")

    def avg_pool(cfg):
        for net in ("net_video_local", "net_text_local"):
            cfg[net]["pooler_config"] = {"name": "avg_special"}
    run("GenPool -> avg pool (local nets)", avg_pool)

    def no_ctx(cfg):
        for net in ("net_video_global", "net_text_global"):
            cfg[net]["use_context"] = False
            cfg[net]["crossatn_config"] = None
    run("no cross-attention (global nets)", no_ctx)

    def no_ff(cfg):
        for net in ("net_video_local", "net_text_local",
                    "net_video_global", "net_text_global"):
            cfg[net]["selfatn_config"]["num_layers"] = 0
    try:
        run("no self-attn layers", no_ff)
    except Exception as e:
        print("no-self-attn failed:", repr(e)[:200])

    def no_fc(cfg):
        for net in ("net_video_local", "net_text_local"):
            cfg[net]["use_input_fc"] = False
            cfg[net]["input_fc_config"] = None
            cfg[net]["selfatn_config"]["hidden_dim"] = (
                4096 if net == "net_video_local" else 1536)
    # skipped: changes hidden dims wildly; not comparable

    def fewer_heads(cfg):
        for net in ("net_video_local", "net_text_local",
                    "net_video_global", "net_text_global"):
            cfg[net]["selfatn_config"]["num_heads"] = 3  # d_head 128
            if cfg[net].get("crossatn_config"):
                cfg[net]["crossatn_config"]["num_heads"] = 3
    run("heads 8 -> 3 (d_head 48 -> 128)", fewer_heads)


if __name__ == "__main__":
    main()
