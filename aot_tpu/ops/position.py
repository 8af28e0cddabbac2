"""2-D position embeddings.

Sine embedding matches the reference's DETR-style generator
(reference: networks/layers/position.py:33-74): per-axis normalised
coordinates scaled to 2π, temperature-1e4 frequency ladder, interleaved
sin/cos, y-channels first. Output is channel-last (1, H, W, C).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("h", "w", "num_pos_feats", "temperature", "normalize"))
def sine_position_embedding(
    h: int,
    w: int,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
) -> jax.Array:
    """Returns (1, H, W, 2*num_pos_feats) float32."""
    y = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
    x = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1), jnp.float32)
    if normalize:
        eps = 1e-6
        y = y / (y[-1:, :] + eps) * scale
        x = x / (x[:, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)

    pos_x = x[:, :, None] / dim_t  # (H, W, F)
    pos_y = y[:, :, None] / dim_t
    # interleave sin(even) / cos(odd)
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1)
    pos_x = pos_x.reshape(h, w, num_pos_feats)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1)
    pos_y = pos_y.reshape(h, w, num_pos_feats)
    pos = jnp.concatenate([pos_y, pos_x], axis=-1)
    return pos[None]


def sine_position_embedding_seq(h: int, w: int, d_model: int = 256) -> jax.Array:
    """(1, H*W, d_model) flattened variant for token sequences."""
    pos = sine_position_embedding(h, w, num_pos_feats=d_model // 2)
    return pos.reshape(1, h * w, d_model)
