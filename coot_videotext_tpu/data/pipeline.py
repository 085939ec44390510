"""
Host -> device prefetch pipeline.

Replaces the reference's DataLoader workers + `batch.to_cuda()` transfer
(reference nntrainer/typext.py:248, data.py:21) with a background prefetch
thread that collates the NEXT batch and `jax.device_put`s it (optionally
sharded over a mesh data axis) while the current step runs — classic
double-buffering so the TPU never waits on the host.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterable, Iterator, Optional

import jax
import numpy as np

# keys transferred to device; everything else (strings) stays on host
_HOST_KEYS = ("key", "data_key", "sentences")


def split_batch(batch: Dict[str, Any]):
    """Split a collated batch into (device arrays, host metadata)."""
    device = {k: v for k, v in batch.items() if k not in _HOST_KEYS}
    host = {k: v for k, v in batch.items() if k in _HOST_KEYS}
    return device, host


def device_put_batch(device_batch: Dict[str, np.ndarray],
                     sharding=None) -> Dict[str, jax.Array]:
    """Transfer one batch; with a NamedSharding the arrays land already
    sharded over the mesh data axis."""
    if sharding is None:
        return jax.device_put(device_batch)
    return {k: jax.device_put(v, sharding) for k, v in device_batch.items()}


class PrefetchIterator:
    """
    Wrap a host batch iterable: a daemon thread runs collation + device_put
    `prefetch` batches ahead. Yields (device_batch, host_meta) tuples.
    """

    def __init__(self, host_iter: Iterable[Dict[str, Any]], *,
                 sharding=None, prefetch: int = 2) -> None:
        self.host_iter = host_iter
        self.sharding = sharding
        self.prefetch = prefetch

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        _SENTINEL = object()

        def producer() -> None:
            try:
                for batch in self.host_iter:
                    if stop.is_set():
                        return
                    device, host = split_batch(batch)
                    device = device_put_batch(device, self.sharding)
                    q.put((device, host))
            except BaseException as e:  # propagate into consumer
                q.put(e)
                return
            q.put(_SENTINEL)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def prefetch_to_device(loader, *, sharding=None,
                       prefetch: int = 2) -> PrefetchIterator:
    """Convenience wrapper used by the trainers."""
    return PrefetchIterator(loader, sharding=sharding, prefetch=prefetch)
