"""Model zoo: encoders, decoders, LSTT/GPM transformer stacks, AOT/DeAOT."""

from aot_tpu.models.aot import AOT, DeAOT, build_vos_model

__all__ = ["AOT", "DeAOT", "build_vos_model"]
