"""
coot_videotext_tpu: a TPU-native (JAX / XLA / pjit / Pallas) framework with the
capabilities of simon-ging/coot-videotext.

Two workloads:
    - Video<->text retrieval (COOT): a 4-transformer hierarchy trained with
      max-margin contrastive + cycle-consistency losses.
    - Video paragraph captioning (MART family): memory-augmented recurrent
      transformers with greedy/beam decoding and language-metric evaluation.

Design is TPU-first, not a port:
    - Static-shape, host-collated batches prefetched onto device.
    - Single jit'd train/eval step over a `jax.sharding.Mesh`; the contrastive
      loss sees the *global* batch as negatives (XLA inserts the all_gather).
    - On-device retrieval evaluation (cosine-sim matrix + rank metrics) instead
      of the reference's O(n^2 log n) host numpy loop.
    - bfloat16 compute on the MXU with float32 loss/softmax accumulation.
    - Pallas kernels for the fused masked-attention / generalized-pooling ops.

Reference layer map: see SURVEY.md; parity points cite reference files as
``reference-file:line`` in docstrings throughout this package.
"""

__version__ = "0.1.0"
