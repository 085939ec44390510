"""Pallas TPU kernels for the hot ops (masked attention, GenPool)."""
