"""Minimal example experiment type (mlp) demonstrating the framework."""
