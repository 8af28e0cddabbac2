"""Encoder-level golden parity for encoders not covered by a full-model
config (MobileNetV3)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "networks")),
    reason="reference repo not mounted")

torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)


def test_mobilenetv3_parity():
    import jax
    import jax.numpy as jnp

    from networks.encoders.mobilenetv3 import MobileNetV3Large as RefMNv3
    from networks.layers.normalization import FrozenBatchNorm2d

    from aot_tpu.models.encoders.mobilenetv3 import MobileNetV3Large
    from aot_tpu.utils.torch_import import _mobilenetv3_rules

    ref = RefMNv3(16, FrozenBatchNorm2d)
    ref.eval()
    # randomise the frozen BN stats so parity is non-trivial
    with torch.no_grad():
        for name, buf in ref.named_buffers():
            if "running_mean" in name:
                buf.normal_(0, 0.2)
            if "running_var" in name:
                buf.uniform_(0.5, 1.5)

    mine = MobileNetV3Large()
    x = np.random.RandomState(0).rand(1, 65, 65, 3).astype(np.float32)
    variables = jax.jit(mine.init)(jax.random.PRNGKey(0), jnp.asarray(x))

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    rules = _mobilenetv3_rules(prefix_my="", prefix_t="")
    rules = [(my.lstrip("/"), tk.lstrip("."), tf) for my, tk, tf in rules]

    # flatten my params
    flat, treedef = jax.tree_util.tree_flatten_with_path(variables["params"])
    keys = ["/".join(str(getattr(k, "key", k)) for k in kp) for kp, _ in flat]
    rule_map = {my: (tk, tf) for my, tk, tf in rules}
    new_leaves = []
    missing = []
    for key, (kp, leaf) in zip(keys, flat):
        hit = rule_map.get(key)
        if hit is None:
            missing.append(key)
            new_leaves.append(leaf)
            continue
        tk, tf = hit
        val = sd[tk]
        val = tf(val) if tf else val
        assert np.shape(val) == np.shape(leaf), (key, tk)
        new_leaves.append(np.asarray(val, np.float32))
    assert not missing, missing[:8]
    params = jax.tree_util.tree_unflatten(treedef, new_leaves)

    with torch.no_grad():
        want = [t.numpy() for t in ref(torch.from_numpy(
            x.transpose(0, 3, 1, 2)))]
    got = jax.jit(mine.apply)({"params": params}, jnp.asarray(x))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w,
                                   rtol=2e-3, atol=2e-3)
