"""Captioning model family (MART + variants), flax/JAX implementation."""
