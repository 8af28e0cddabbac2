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


def _randomize_bn_stats(ref, seed=0, var_lo=0.5, var_hi=1.5):
    """Randomise the frozen BN stats so parity is non-trivial. Seeded: the
    torch global RNG state otherwise depends on test order. Deep stacks
    (63 blocks) need var >= 1 (each BN then contracts) or activations blow
    up to ~1e4 and ReLU sign flips turn fp32 drift into chaos."""
    torch.manual_seed(seed)
    with torch.no_grad():
        for name, buf in ref.named_buffers():
            if "running_mean" in name:
                buf.normal_(0, 0.2)
            if "running_var" in name:
                buf.uniform_(var_lo, var_hi)


def _convert_with_rules(variables, ref, rules):
    """Apply importer (my_key, torch_key, transform) rules to a flax tree."""
    import jax

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    rules = [(my.lstrip("/"), tk.lstrip("."), tf) for my, tk, tf in rules]
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
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _assert_feature_parity(mine, params, ref, x, rel=None):
    """rel=None: elementwise allclose. rel=r: max|g-w| <= r * std(w) — for
    very deep stacks where random BN stats blow activations up to ~1e4 and
    fp32 accumulation drift makes elementwise tolerances meaningless."""
    import jax
    import jax.numpy as jnp

    with torch.no_grad():
        want = [t.numpy() for t in ref(torch.from_numpy(
            x.transpose(0, 3, 1, 2)))]
    got = jax.jit(mine.apply)({"params": params}, jnp.asarray(x))
    for g, w in zip(got, want):
        g = np.asarray(g).transpose(0, 3, 1, 2)
        if rel is None:
            np.testing.assert_allclose(g, w, rtol=2e-3, atol=2e-3)
        else:
            err = np.abs(g - w).max() / (np.abs(w).std() + 1e-9)
            assert err <= rel, (err, rel)


def test_mobilenetv3_parity():
    import jax
    import jax.numpy as jnp

    from networks.encoders.mobilenetv3 import MobileNetV3Large as RefMNv3
    from networks.layers.normalization import FrozenBatchNorm2d

    from aot_tpu.models.encoders.mobilenetv3 import MobileNetV3Large
    from aot_tpu.utils.torch_import import _mobilenetv3_rules

    ref = RefMNv3(16, FrozenBatchNorm2d)
    ref.eval()
    _randomize_bn_stats(ref)

    mine = MobileNetV3Large()
    x = np.random.RandomState(0).rand(1, 65, 65, 3).astype(np.float32)
    variables = jax.jit(mine.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _convert_with_rules(
        variables, ref, _mobilenetv3_rules(prefix_my="", prefix_t=""))
    _assert_feature_parity(mine, params, ref, x)


@pytest.mark.slow
def test_resnest200_parity():
    """ResNeSt-200 (reference: resnest/resnest.py:71-89, factory kwargs
    encoders/__init__.py:24-31). 50/101 are covered by full-model goldens;
    200/269 differ only in (layers, stem_width), so one deep variant
    suffices."""
    import jax
    import jax.numpy as jnp

    from networks.encoders.resnest import resnest as ref_resnest
    from networks.layers.normalization import FrozenBatchNorm2d

    from aot_tpu.models.encoders.resnest import ResNeSt
    from aot_tpu.utils.torch_import import _resnest_rules

    ref = ref_resnest.resnest200(norm_layer=FrozenBatchNorm2d, dilation=2)
    ref.eval()
    _randomize_bn_stats(ref, var_lo=1.0, var_hi=2.0)

    mine = ResNeSt.named("resnest200")
    x = np.random.RandomState(1).rand(1, 49, 49, 3).astype(np.float32)
    variables = jax.jit(mine.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    rules = _resnest_rules((3, 24, 36), prefix_my="", prefix_t="")
    params = _convert_with_rules(variables, ref, rules)
    _assert_feature_parity(mine, params, ref, x, rel=1e-2)
