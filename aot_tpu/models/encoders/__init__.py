"""Backbone encoders. All return [x4, x8, x16, x16] NHWC feature maps
(reference: networks/encoders/__init__.py:10-35; stride-16 dilated, stage-5
dropped)."""

from typing import Any

from aot_tpu.models.encoders.mobilenetv2 import MobileNetV2
from aot_tpu.models.encoders.resnet import ResNet50, ResNet101


def build_encoder(name: str, frozen_bn: bool = True, freeze_at: int = -1,
                  dtype: Any = None):
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    if name == "mobilenetv2":
        return MobileNetV2(frozen_bn=frozen_bn, dtype=dtype)
    if name == "resnet50":
        return ResNet50(frozen_bn=frozen_bn, dtype=dtype)
    if name == "resnet101":
        return ResNet101(frozen_bn=frozen_bn, dtype=dtype)
    if "swin" in name:
        from aot_tpu.models.encoders.swin import SwinTransformer

        return SwinTransformer.base(dtype=dtype)
    if name == "mobilenetv3":
        from aot_tpu.models.encoders.mobilenetv3 import MobileNetV3Large

        return MobileNetV3Large(frozen_bn=frozen_bn, dtype=dtype)
    if name.startswith("resnest"):
        from aot_tpu.models.encoders.resnest import ResNeSt

        return ResNeSt.named(name, frozen_bn=frozen_bn, dtype=dtype)
    raise NotImplementedError(name)


def frozen_param_patterns(name: str, freeze_at: int):
    """Param-path prefixes to freeze for a given encoder & freeze_at stage
    (reference freezes modules in-place, e.g. mobilenetv2.py:240-247; we
    freeze via optimizer masking on these path prefixes)."""
    if freeze_at < 1:
        return []
    if name == "mobilenetv2":
        pats = [["encoder/features_0"]]
        stage_feats = [range(0, 4), range(4, 7), range(7, 14), range(14, 19)]
        pats += [[f"encoder/features_{i}" for i in rng] for rng in stage_feats]
    elif name.startswith(("resnet", "resnest")):
        pats = [["encoder/conv1", "encoder/bn1"]]
        pats += [[f"encoder/layer{i}"] for i in range(1, 5)]
    elif "swin" in name:
        pats = [["encoder/patch_embed"]]
        pats += [[f"encoder/layers_{i}"] for i in range(4)]
    elif name == "mobilenetv3":
        pats = [["encoder/features_0"]]
        pats += [[f"encoder/stage_{i}"] for i in range(4)]
    else:
        return []
    out = []
    # freeze_at=1 -> stem only; >=2 -> stem + stages[0..freeze_at-2]
    out += pats[0]
    for idx in range(1, len(pats)):
        if freeze_at >= idx + 1:
            out += pats[idx]
    # terminate every module prefix with '/': a bare "encoder/features_1"
    # prefix would also capture features_10..18 (that collision silently
    # froze MobileNetV2's nine deepest blocks and crippled training)
    return [p if p.endswith("/") else p + "/" for p in out]
