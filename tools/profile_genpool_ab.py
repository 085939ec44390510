"""Fused GenPool kernel (ops/pallas_genpool.py) step-time A/B at real
bench shapes: model-only fwd+bwd+opt (tools/profile_train_step.variant_
model_only) with the kernel gated off vs on. Run on a real chip; the
keep-or-revert decision and numbers are recorded in docs/PERFORMANCE.md.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import tools.profile_train_step as P


def measure(label: str) -> float:
    ctx = P.build()
    per = P.variant_model_only(ctx)
    print(f"{label:44s} {per * 1e3:8.2f} ms", flush=True)
    del ctx
    return per


def main() -> None:
    os.environ.pop("COOT_TPU_FUSED_GENPOOL", None)
    base = measure("model-only, unfused GenPool (default)")
    os.environ["COOT_TPU_FUSED_GENPOOL"] = "1"
    fused = measure("model-only, fused Pallas GenPool")
    print(f"delta: {(base - fused) * 1e3:+.2f} ms "
          f"({(base - fused) / base * 100:+.1f}% of model block)")


if __name__ == "__main__":
    main()
