"""Checkpoint-format parity: .pth export round-trip (the inverse of
utils/torch_import.py). Verifies
  1. export(params) -> convert_state_dict -> identical params (all keys
     mapped both ways, no silent fallthrough to init values);
  2. the exported state_dict loads into the actual reference torch model
     with no unexpected keys and nothing missing but buffers — i.e. the
     reference engine (utils/checkpoint.py:94-121 prefix-tolerant load)
     can run TPU-trained weights.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)


def _my_params(model_name: str, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from aot_tpu.configs import build_config
    from aot_tpu.models import build_vos_model

    cfg = build_config(stage="ytb", model=model_name)
    model = build_vos_model(cfg, eval_mode=True)
    h = w = 65
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    oh = jnp.zeros((1, h, w, cfg.MODEL_MAX_OBJ_NUM + 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), img, oh,
                        deterministic=True)["params"]
    return cfg, params


@pytest.mark.parametrize("model_name", [
    "aott", "deaott", pytest.param("r50_aotl", marks=pytest.mark.slow)])
def test_export_import_roundtrip(model_name):
    import jax

    from aot_tpu.utils.torch_import import convert_state_dict, export_state_dict

    cfg, params = _my_params(model_name, seed=0)
    _, other = _my_params(model_name, seed=1)  # different init as the target

    sd, unmapped = export_state_dict(params, cfg)
    assert not unmapped, f"params with no reference counterpart: {unmapped[:8]}"

    got, missing, unused = convert_state_dict(sd, other, cfg)
    assert not missing, f"rule table not invertible for: {missing[:8]}"
    assert not unused, f"exported keys the importer ignores: {unused[:8]}"

    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(got)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "networks")),
                    reason="reference repo not mounted")
@pytest.mark.parametrize("model_name", ["aott", "deaott"])
def test_reference_model_loads_export(model_name, tmp_path, monkeypatch):
    from aot_tpu.utils.torch_import import save_torch_checkpoint

    monkeypatch.chdir(tmp_path)
    cfg, params = _my_params(model_name)
    path = str(tmp_path / "save_step_1000.pth")
    unmapped = save_torch_checkpoint(path, params, cfg)
    assert not unmapped

    from configs.default import DefaultEngineConfig
    import networks.models as ref_models

    ref_cfg = DefaultEngineConfig("export_test", model_name)
    ref_model = ref_models.build_vos_model(ref_cfg.MODEL_VOS, ref_cfg)

    blob = torch.load(path, map_location="cpu", weights_only=False)
    result = ref_model.load_state_dict(blob["state_dict"], strict=False)
    assert not result.unexpected_keys, result.unexpected_keys[:8]
    # acceptable missing entries: non-learned buffers, plus LSTT.mask_token —
    # a dead reference parameter whose only use is commented out (reference
    # transformer.py:59,105); it never receives gradients (DDP
    # find_unused_parameters=True) and its value is irrelevant
    allowed = ("num_batches_tracked", "relative_position_index", "attn_mask",
               "mask_token")
    bad = [k for k in result.missing_keys if not any(a in k for a in allowed)]
    assert not bad, f"reference params the export does not provide: {bad[:8]}"
