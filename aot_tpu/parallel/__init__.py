"""Device-mesh parallelism (reference: DDP/NCCL, trainer.py:60-74 — here
XLA collectives over ICI via jax.sharding)."""

from aot_tpu.parallel.mesh import make_mesh, shard_batch, replicate

__all__ = ["make_mesh", "shard_batch", "replicate"]
