"""PatchwiseIdBank: the blocked-matmul label path must exactly match the
conv-over-one-hot path (reference semantics: networks/models/aot.py:50-63,
id bank conv over utils/image.py:69-74 one-hot)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aot_tpu.models.aot import PatchwiseIdBank
from aot_tpu.ops.image import one_hot_mask


def _bank(ks, pad, cin=11, co=32):
    return PatchwiseIdBank(
        features=co, cin=cin, ks=ks, pad=pad,
        kernel_init=jax.nn.initializers.normal(0.02),
        bias_init=jax.nn.initializers.normal(0.02))


@pytest.mark.parametrize("ks,pad,size", [
    (17, 8, (33, 33)),    # align_corners snap: H ≡ 1 (mod 16)
    (17, 8, (33, 49)),
    (17, 8, (41, 37)),    # non-snapped odd sizes
    (16, 0, (32, 32)),    # align_corners=False snap: H ≡ 0 (mod 16)
    (16, 0, (48, 32)),
])
def test_label_path_matches_conv(ks, pad, size):
    bank = _bank(ks, pad)
    rng = np.random.RandomState(0)
    label = jnp.asarray(rng.randint(0, 11, (2,) + size), jnp.int32)
    params = bank.init(jax.random.PRNGKey(0),
                       one_hot_mask(label, 10))
    ref = bank.apply(params, one_hot_mask(label, 10))
    fast = bank.apply(params, label=label)
    assert ref.shape == fast.shape
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_label_path_handles_trailing_channel():
    bank = _bank(17, 8)
    rng = np.random.RandomState(1)
    label = jnp.asarray(rng.randint(0, 11, (1, 33, 33)), jnp.int32)
    params = bank.init(jax.random.PRNGKey(0), one_hot_mask(label, 10))
    a = bank.apply(params, label=label)
    b = bank.apply(params, label=label.astype(jnp.float32))  # float labels ok
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_param_tree_matches_nn_conv():
    """The swap from nn.Conv must not change the checkpoint tree."""
    bank = _bank(17, 8)
    label = jnp.zeros((1, 33, 33), jnp.int32)
    params = bank.init(jax.random.PRNGKey(0), one_hot_mask(label, 10))
    leaves = params["params"]
    assert set(leaves.keys()) == {"kernel", "bias"}
    assert leaves["kernel"].shape == (17, 17, 11, 32)
    assert leaves["bias"].shape == (32,)
