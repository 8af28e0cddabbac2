"""Config system: model-config × stage-config composition.

Mirrors the reference's two-axis composition and flat SCREAMING_SNAKE key
surface (reference: configs/default.py:5-9 merges a model config into an
engine config via dict update; stage modules override attributes), but is
built as data-driven registries instead of a class-inheritance tree, and adds
TPU-specific knobs (ring-buffer capacities, dtypes, mesh axes).

Usage (same shape as the reference CLI path):

    cfg = build_config(stage='pre_ytb_dav', model='r50_aotl', exp_name='aot')
    cfg.MODEL_LSTT_NUM   # -> 3
"""

from aot_tpu.configs.config import Config, build_config, build_model_config
from aot_tpu.configs.models import MODEL_REGISTRY
from aot_tpu.configs.stages import STAGE_REGISTRY

__all__ = [
    "Config",
    "build_config",
    "build_model_config",
    "MODEL_REGISTRY",
    "STAGE_REGISTRY",
]
