"""
Pallas TPU kernels for the hot ops, with honest measurements.

- pallas_attention: fused masked attention (QK^T->mask->softmax->PV in
  VMEM, flash-style recomputing backward). Wins on the real v5e only for
  Lk >= 256; COOT's stock L=80 stays on the XLA path (see module docstring
  for the chain-difference numbers).
- pallas_gather: scalar-prefetch DMA row gather from the HBM feature
  store. MEASURED NEGATIVE RESULT — per-row DMA issue cost dominates at
  8KB rows (~2 GB/s vs XLA gather ~105 GB/s); kept as the reference
  pattern, production uses the XLA gather.
- GenPool (models/poolers.py) deliberately has NO pallas kernel: it is a
  chain of tiny per-head matmuls (L<=80, d_head<=128) + masked softmax +
  weighted sum, which XLA already fuses into a few kernels; the attention
  measurements above show hand-written pallas loses to XLA at exactly this
  operand scale, so the survey's "GenPool kernel" item is consciously
  served by the fused XLA path.
"""
