"""A/B the pallas attention kernel inside the real model step
(dropout zeroed so the kernel path is eligible)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import tools.profile_train_step as P


def zero_dropout(cfg):
    for net in ("net_video_local", "net_text_local",
                "net_video_global", "net_text_global"):
        cfg[net]["selfatn_config"]["dropout"] = 0
        if cfg[net].get("crossatn_config"):
            cfg[net]["crossatn_config"]["dropout"] = 0
        cfg[net]["pooler_config"]["dropout"] = 0


def main():
    os.environ["COOT_TPU_PALLAS_ATTENTION"] = "0"
    ctx = P.build(zero_dropout)
    per = P.variant_model_only(ctx)
    print(f"model+opt, dropout=0, XLA attention:    {per*1e3:8.2f} ms",
          flush=True)
    del ctx
    os.environ["COOT_TPU_PALLAS_ATTENTION"] = "1"
    ctx = P.build(zero_dropout)
    per = P.variant_model_only(ctx)
    print(f"model+opt, dropout=0, pallas attention: {per*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
