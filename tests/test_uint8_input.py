"""uint8 device-side normalisation must equal host-side normalisation."""

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from aot_tpu.configs import build_config
from aot_tpu.data import IMAGENET_MEAN, IMAGENET_STD
from aot_tpu.engine import build_infer_engine
from aot_tpu.models import build_vos_model


def test_uint8_matches_normalized_float():
    cfg = build_config(stage="pre", model="aott")
    model = build_vos_model(cfg, eval_mode=True)
    H = W = 65
    rng = np.random.RandomState(0)
    raw = (rng.rand(1, H, W, 3) * 255).astype(np.uint8)
    norm = ((raw.astype(np.float32) / 255.0 - np.asarray(IMAGENET_MEAN))
            / np.asarray(IMAGENET_STD)).astype(np.float32)

    oh = jnp.zeros((1, H, W, 11)).at[..., 0].set(1.0)
    params = jax.jit(partial(model.init, deterministic=True))(
        jax.random.PRNGKey(0), jnp.asarray(norm), oh)["params"]
    eng = build_infer_engine(model, cfg)

    f = jax.jit(lambda p, i: eng.engine.encode_image(p, i)[-1])
    a = np.asarray(f(params, jnp.asarray(raw)))
    b = np.asarray(f(params, jnp.asarray(norm)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
