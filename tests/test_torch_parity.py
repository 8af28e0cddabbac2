"""Golden output-parity tests against the PyTorch reference.

Builds the reference model (imported read-only from /root/reference, CPU,
random weights), converts its state_dict with torch_import, and checks that
this framework's forward produces matching activations — the strongest
available proxy for J&F parity without dataset/weights.
"""

import os
import sys
from functools import partial

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "networks")),
    reason="reference repo not mounted")

torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)


def _fixed_v3_forward(self, q, k, v):
    """The mounted reference's MultiheadLocalAttentionV3 forward is broken
    (attention.py:530-532 adds mismatched shapes — the pure-torch fallback
    was evidently never run there). This replacement implements the
    documented window-attention math with unfold, using the module's own
    parameters, so the reference model can serve as a golden oracle."""
    import torch.nn.functional as F

    n, c, h, w = q.size()
    heads = self.num_head
    hidden = c // heads
    win2 = self.window_size ** 2
    pad = self.max_dis * self.dilation

    def unfold(x):
        x = F.pad(x, (pad, pad, pad, pad))
        return F.unfold(x, self.window_size, dilation=self.dilation)

    rel = self.relative_emb_k(q).view(n, heads, win2, h * w)
    qs = (q / self.T).view(n, heads, hidden, 1, h * w)
    uk = unfold(k).view(n, heads, hidden, win2, h * w)
    scores = (qs * uk).sum(2) + rel
    valid = unfold(torch.ones(1, 1, h, w)).view(1, 1, win2, h * w)
    scores = scores - (1 - valid) * 1e8
    attn = torch.softmax(scores, dim=2)
    uv = unfold(v).view(n, heads, hidden, win2, h * w)
    out = (attn.unsqueeze(2) * uv).sum(3)
    out = out + torch.einsum("nhwq,hcw->nhcq", attn, self.relative_emb_v)
    out = out.reshape(n, c, h * w).permute(2, 0, 1)
    return self.projection(out), attn


def _build_reference(model_name: str):
    import networks.layers.attention as ref_att

    ref_att.MultiheadLocalAttentionV3.forward = _fixed_v3_forward

    from configs.default import DefaultEngineConfig

    cfg = DefaultEngineConfig("parity", model_name)
    import networks.models as ref_models

    model = ref_models.build_vos_model(cfg.MODEL_VOS, cfg)
    model.eval()
    return cfg, model


def _build_mine(model_name: str):
    import jax
    import jax.numpy as jnp

    from aot_tpu.configs import build_config
    from aot_tpu.models import build_vos_model

    cfg = build_config(stage="ytb", model=model_name)
    model = build_vos_model(cfg, eval_mode=True)
    return cfg, model


@pytest.mark.parametrize("model_name", [
    "aott", "aots", "deaott", "r50_aotl",
    pytest.param("swinb_aotl", marks=pytest.mark.slow),
    pytest.param("rs101_aotl", marks=pytest.mark.slow)])
def test_reference_forward_parity(model_name, tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp

    from aot_tpu.utils.torch_import import convert_state_dict

    monkeypatch.chdir(tmp_path)  # reference configs may create dirs
    ref_cfg, ref_model = _build_reference(model_name)
    my_cfg, my_model = _build_mine(model_name)

    H = W = 65 if my_cfg.MODEL_ALIGN_CORNERS else 64
    rng = np.random.RandomState(0)
    img = rng.rand(1, H, W, 3).astype(np.float32)
    mask = np.zeros((1, H, W), np.int64)
    mask[0, 10:30, 10:30] = 1
    mask[0, 40:60, 35:60] = 2

    # --- reference forward (reference-frame path) ---
    timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
    t_onehot = torch.nn.functional.one_hot(
        torch.from_numpy(mask), 11).permute(0, 3, 1, 2).float()
    with torch.no_grad():
        xs = ref_model.encode_image(timg)
        size_2d = xs[-1].shape[-2:]
        pos = ref_model.get_pos_emb(xs[-1]).expand(1, -1, -1, -1)
        pos = pos.view(1, 256, -1).permute(2, 0, 1)
        id_emb = ref_model.get_id_emb(t_onehot).view(1, 256, -1).permute(2, 0, 1)
        embs, curr_mems, long_mems, short_mems = ref_model.LSTT_forward(
            xs, None, None, id_emb, pos_emb=pos, size_2d=tuple(size_2d))
        ref_logits = ref_model.decode_id_logits(embs, xs).numpy()

        # second frame: propagate against the stored memories
        timg2 = torch.from_numpy(
            (img * 0.8 + 0.1).transpose(0, 3, 1, 2).copy())
        xs2 = ref_model.encode_image(timg2)
        embs2, _, _, _ = ref_model.LSTT_forward(
            xs2, list(long_mems), list(short_mems), None, pos_emb=pos,
            size_2d=tuple(size_2d))
        ref_logits2 = ref_model.decode_id_logits(embs2, xs2).numpy()

    # --- mine, with converted weights ---
    jimg = jnp.asarray(img)
    j_onehot = jax.nn.one_hot(jnp.asarray(mask), 11)
    variables = jax.jit(partial(my_model.init, deterministic=True))(
        jax.random.PRNGKey(0), jimg, j_onehot)
    params, missing, unused = convert_state_dict(
        ref_model.state_dict(), variables["params"], my_cfg)
    # every torch parameter must land somewhere
    real_missing = [m for m in missing if "running" not in m]
    assert not real_missing, f"unconverted params: {real_missing[:10]}"
    # LSTT.mask_token is dead in the reference (its use is commented out,
    # transformer.py:105)
    unused = [u for u in unused if u != "LSTT.mask_token"]
    assert not unused, f"unused torch keys: {unused[:10]}"

    from aot_tpu.engine import build_infer_engine

    eng = build_infer_engine(my_model, my_cfg)
    add = jax.jit(lambda p, i, m: eng.add_reference_frame(p, i, m, obj_num=2))
    state = add(params, jimg, jnp.asarray(mask.astype(np.int32)))
    my_logits = np.asarray(jax.jit(
        lambda p, s: eng.engine.decode_logits(p, s))(params, state))

    got = my_logits[0].transpose(2, 0, 1)  # NHWC -> CHW
    want = ref_logits[0]
    # unused-id masking: compare only live classes
    np.testing.assert_allclose(got[:3], want[:3], rtol=2e-3, atol=2e-3)

    # --- propagate parity ---
    prop = jax.jit(lambda p, s, i: eng.propagate(p, s, i))
    state = prop(params, state, jnp.asarray(img * 0.8 + 0.1))
    my_logits2 = np.asarray(jax.jit(
        lambda p, s: eng.engine.decode_logits(p, s))(params, state))
    got2 = my_logits2[0].transpose(2, 0, 1)
    want2 = ref_logits2[0]
    np.testing.assert_allclose(got2[:3], want2[:3], rtol=2e-3, atol=2e-3)
