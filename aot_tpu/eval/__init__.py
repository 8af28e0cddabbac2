"""Evaluation: the online per-video inference loop."""

from aot_tpu.eval.evaluator import Evaluator

__all__ = ["Evaluator"]
