"""Mesh construction + sharding helpers.

The reference's only training parallelism is data parallelism via DDP
(SURVEY §2.10); TPU-native that is a 1-axis mesh with the batch sharded over
ICI and parameters replicated — XLA inserts the gradient all-reduce. Eval
work distribution is host-side (per-video queue), not collective.

The helpers keep an extensible axis layout so model axes (tensor/sequence)
can be added without touching call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = -1, axis: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else list(jax.devices())
    if n_devices > 0:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(mesh: Mesh, tree, batch_axis: int = 0, axis: str = "data"):
    """Place a host batch with its leading (or given) axis split over the
    mesh's data axis."""

    def put(x):
        spec = [None] * x.ndim
        spec[batch_axis] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def batch_spec(ndim: int, batch_axis: int = 0, axis: str = "data") -> P:
    spec = [None] * ndim
    spec[batch_axis] = axis
    return P(*spec)
