"""
Profiling utilities: device memory / host RAM sampling and jax.profiler
trace capture.

TPU counterpart of reference nntrainer/utils_torch.py:114-228
(profile_gpu_and_ram via GPUtil/psutil) and the trainer's GPU meters
(trainer_base.py:571-602): device HBM comes from
jax.local_devices()[0].memory_stats(); step-time decomposition lives in the
trainer's hook timers; full program traces (the reference has none — no
torch profiler/chrome traces) come from `trace()` writing TensorBoard-
loadable .xplane profiles.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Tuple

import psutil


def profile_device_and_ram() -> Dict[str, float]:
    """
    Sample device + host memory. Returns a dict with (GB / fraction):
    device_mem_used, device_mem_limit, device_mem_percent, ram_used,
    ram_total, ram_percent. Missing device stats (e.g. CPU backend) are 0.
    """
    import jax
    out = {"device_mem_used": 0.0, "device_mem_limit": 0.0,
           "device_mem_percent": 0.0}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        used = stats.get("bytes_in_use", 0)
        limit = stats.get("bytes_limit", 0)
        out["device_mem_used"] = used / 1024 ** 3
        out["device_mem_limit"] = limit / 1024 ** 3
        if limit:
            out["device_mem_percent"] = used / limit
    except Exception:
        pass
    vm = psutil.virtual_memory()
    out["ram_used"] = (vm.total - vm.available) / 1024 ** 3
    out["ram_total"] = vm.total / 1024 ** 3
    out["ram_percent"] = vm.percent / 100.0
    return out


@contextlib.contextmanager
def trace(log_dir: str):
    """
    Capture a jax.profiler trace of the enclosed block:

        with profiling.trace("experiments/.../profiles"):
            train_step(...)

    View with TensorBoard's profile plugin or Perfetto.
    """
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def set_seed(seed: int) -> None:
    """
    Seed the host RNGs (python random + numpy), the counterpart of
    reference utils_torch.py:54 set_seed (cudnn flags have no TPU
    equivalent; device randomness is explicit jax.random keys threaded
    from the trainer's root key).
    """
    import random

    import numpy as np
    random.seed(seed)
    np.random.seed(seed)


def count_parameters(params) -> Tuple[int, int]:
    """(total, total) parameter counts for a pytree (the reference returns
    (total, trainable); jax params are all trainable unless masked in the
    optimizer)."""
    import jax
    import numpy as np
    total = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(params))
    return total, total
