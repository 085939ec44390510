"""
Retrieval evaluation: rank metrics of a cosine-similarity matrix.

API parity with reference nntrainer/retrieval.py:12-98 (VALKEYS, VALHEADER,
retrieval_results_to_str, compute_retrieval, compute_retrieval_cosine).

The reference computes ranks on host with a per-row numpy argsort —
O(n^2 log n) python loop, the "retrieval eval wall-clock" hot spot
(retrieval.py:84-92). Here ranks are computed ON DEVICE in one jitted O(n^2)
comparison: rank_i = #\\{j : sim[i,j] > sim[i,i]\\} (identical to argsort rank
for distinct scores; ties among float embeddings are measure-zero). The
numpy API is kept as a thin wrapper so offline tools run unchanged.
"""

from __future__ import annotations

from functools import partial
from timeit import default_timer as timer
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

VALKEYS = ["r1", "r5", "r10", "r50", "medr", "meanr", "sum"]
VALHEADER = ("Retriev | R@1   | R@5   | R@10  | R@50  | MeanR |  MedR |"
             "    Sum")


def retrieval_results_to_str(results: Dict[str, float], name: str) -> str:
    """One formatted metrics row (reference :16)."""
    return ("{:7s} | {:.3f} | {:.3f} | {:.3f} | {:.3f} | {:5.1f} | "
            "{:5.1f} | {:6.3f}").format(
                name, *[results[key] for key in VALKEYS])


@jax.jit
def _ranks_both(emb1: jnp.ndarray, emb2: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                           jnp.ndarray]:
    """Device kernel: (ranks 1->2, top1 1->2, ranks 2->1, top1 2->1)."""
    emb1 = emb1.astype(jnp.float32)
    emb2 = emb2.astype(jnp.float32)
    sim = jnp.dot(emb1, emb2.T, preferred_element_type=jnp.float32)
    diag = jnp.diagonal(sim)
    ranks12 = jnp.sum(sim > diag[:, None], axis=1)
    ranks21 = jnp.sum(sim > diag[None, :], axis=0)
    top1_12 = jnp.argmax(sim, axis=1)
    top1_21 = jnp.argmax(sim, axis=0)
    return ranks12, top1_12, ranks21, top1_21


def _metrics_from_ranks(ranks: np.ndarray) -> Dict[str, float]:
    ranks = np.asarray(ranks, np.float64)
    n = len(ranks)
    r1 = float((ranks < 1).sum() / n)
    r5 = float((ranks < 5).sum() / n)
    r10 = float((ranks < 10).sum() / n)
    r50 = float((ranks < 50).sum() / n)
    medr = float(np.floor(np.median(ranks)) + 1)
    meanr = float(ranks.mean() + 1)
    return {"r1": r1, "r5": r5, "r10": r10, "r50": r50, "medr": medr,
            "meanr": meanr, "sum": r1 + r5 + r50}


def compute_retrieval_cosine(dot_product: np.ndarray
                             ) -> Tuple[Dict[str, float], np.ndarray,
                                        np.ndarray]:
    """Numpy-API parity (reference :68): metrics from a host sim matrix."""
    d = np.asarray(dot_product, np.float32)
    diag = np.diagonal(d)
    ranks = (d > diag[:, None]).sum(axis=1)
    top1 = d.argmax(axis=1)
    return _metrics_from_ranks(ranks), top1, ranks.astype(np.float64)


def compute_retrieval(data_collector: Dict[str, np.ndarray], key1: str,
                      key2: str, print_fn: Callable = print
                      ) -> Tuple[Dict[str, float], Dict[str, float], float,
                                 str]:
    """
    Bidirectional retrieval metrics between two embedding sets
    (reference :31). Accepts numpy or jax arrays; math runs on device.
    """
    start_time = timer()
    emb1 = jnp.asarray(np.asarray(data_collector[key1]))
    emb2 = jnp.asarray(np.asarray(data_collector[key2]))
    ranks12, _, ranks21, _ = jax.device_get(_ranks_both(emb1, emb2))
    res1 = _metrics_from_ranks(ranks12)
    res2 = _metrics_from_ranks(ranks21)
    sum_at_1 = (res1["r1"] + res2["r1"]) / 2
    print_fn(retrieval_results_to_str(res1, key1[:3]))
    print_fn(retrieval_results_to_str(res2, key2[:3]))
    num_points = emb1.shape[0]
    result_str = (f"{key1[:3]}{key2[:3]} ({num_points}) in "
                  f"{timer() - start_time:.3f}s, ")
    return res1, res2, sum_at_1, result_str
