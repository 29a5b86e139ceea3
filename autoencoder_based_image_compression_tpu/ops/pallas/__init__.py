"""Pallas TPU kernels for the inference hot path."""
