"""Numeric ops: image resizing, one-hot, attention primitives, losses,
position embeddings, and Pallas TPU kernels."""
