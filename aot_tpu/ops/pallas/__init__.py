"""Pallas TPU kernels for the attention hot paths."""
