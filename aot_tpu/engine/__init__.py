"""Temporal engines: the memory state machine driving AOT/DeAOT
(reference: networks/engines/)."""

from aot_tpu.engine.state import EngineState
from aot_tpu.engine.engine import VOSEngine
from aot_tpu.engine.infer import VOSInferEngine, build_infer_engine

__all__ = ["EngineState", "VOSEngine", "VOSInferEngine", "build_infer_engine"]
