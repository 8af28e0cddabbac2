"""aot_tpu — TPU-native AOT/DeAOT video object segmentation framework.

A from-scratch JAX/XLA/Pallas implementation with the capability surface of
the PyTorch reference (yoxu515/aot-benchmark). See ARCHITECTURE.md.
"""

__version__ = "0.1.0"
