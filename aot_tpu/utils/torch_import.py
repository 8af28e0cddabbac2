"""PyTorch checkpoint import: maps the reference framework's state_dict keys
(reference: networks/* module names, checkpoint format utils/checkpoint.py)
onto this framework's parameter pytree.

torch is used ONLY here (and in tests) — never on the compute path.

Layout transforms:
  Linear  torch (out, in)            -> kernel (in, out)
  Conv    torch (O, I, kh, kw)       -> kernel (kh, kw, I, O)
  Depthwise conv torch (C, 1, kh, kw)-> kernel (kh, kw, 1, C)
  relative_emb_k grouped conv (h*w2, d, 1, 1) -> (h, w2, d) weight + (h, w2) bias
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

import numpy as np


class _T:
    """An invertible layout transform: __call__ = torch->here (import),
    .inv = here->torch (export). Keeping both directions on the same rule
    object is what makes the .pth round-trip (utils/checkpoint.py:124-160
    format) a table inversion instead of a second table."""

    def __init__(self, fwd, inv):
        self._fwd, self.inv = fwd, inv

    def __call__(self, w):
        return self._fwd(w)


def _c(f):
    return lambda w: np.ascontiguousarray(f(w))


# Linear: torch (out, in) <-> kernel (in, out)
_t_linear = _T(_c(lambda w: np.transpose(w, (1, 0))),
               _c(lambda w: np.transpose(w, (1, 0))))
# Conv: torch OIHW <-> kernel HWIO
_t_conv = _T(_c(lambda w: np.transpose(w, (2, 3, 1, 0))),
             _c(lambda w: np.transpose(w, (3, 2, 0, 1))))
# Depthwise conv: torch (C, 1, kh, kw) <-> kernel (kh, kw, 1, C)
_t_dwconv = _t_conv


def _t_rel_w(num_heads: int, d_att: int, win2: int) -> _T:
    """relative_emb_k grouped 1x1 conv (h*w2, d, 1, 1) <-> (h, w2, d)."""
    return _T(
        _c(lambda w: w.reshape(num_heads, win2, d_att)),
        _c(lambda w: w.reshape(num_heads * win2, d_att, 1, 1)))


def _t_rel_b(num_heads: int, win2: int) -> _T:
    return _T(_c(lambda b: b.reshape(num_heads, win2)),
              _c(lambda b: b.reshape(-1)))


# 1x1 conv used as a linear (ResNeSt SplAt fc1/fc2): (O, I, 1, 1) <-> (I, O)
_t_fc1x1 = _T(_c(lambda w: np.transpose(w[:, :, 0, 0], (1, 0))),
              _c(lambda w: np.transpose(w, (1, 0))[:, :, None, None]))


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "")
        try:
            out[k] = v.detach().cpu().numpy()
        except AttributeError:
            continue
    return out


# ---------------------------------------------------------------------------
# my flat path -> (torch key, transform)
# ---------------------------------------------------------------------------


def _map_norm(my: str, torch_prefix: str, rules):
    rules.append((f"{my}/LayerNorm_0/scale", f"{torch_prefix}.weight", None))
    rules.append((f"{my}/LayerNorm_0/bias", f"{torch_prefix}.bias", None))


def _map_gn(my: str, torch_prefix: str, rules):
    rules.append((f"{my}/GroupNorm_0/scale", f"{torch_prefix}.weight", None))
    rules.append((f"{my}/GroupNorm_0/bias", f"{torch_prefix}.bias", None))


def _map_linear(my: str, torch_prefix: str, rules, bias=True):
    rules.append((f"{my}/kernel", f"{torch_prefix}.weight", _t_linear))
    if bias:
        rules.append((f"{my}/bias", f"{torch_prefix}.bias", None))


def _map_conv(my: str, torch_prefix: str, rules, bias=True, dw=False):
    rules.append((f"{my}/kernel", f"{torch_prefix}.weight",
                  _t_dwconv if dw else _t_conv))
    if bias:
        rules.append((f"{my}/bias", f"{torch_prefix}.bias", None))


def _map_bn(my: str, torch_prefix: str, rules):
    for a, b in (("weight", "weight"), ("bias", "bias"),
                 ("running_mean", "running_mean"),
                 ("running_var", "running_var")):
        rules.append((f"{my}/{a}", f"{torch_prefix}.{b}", None))


def _map_mha(my: str, tp: str, rules, use_linear: bool):
    if use_linear:
        _map_linear(f"{my}/linear_Q", f"{tp}.linear_Q", rules)
        _map_linear(f"{my}/linear_K", f"{tp}.linear_K", rules)
        _map_linear(f"{my}/linear_V", f"{tp}.linear_V", rules)
    _map_linear(f"{my}/projection", f"{tp}.projection", rules)


def _map_local_attn(my: str, tp: str, rules, num_heads: int, d_att: int,
                    win2: int = 225):
    rules.append((f"{my}/relative_emb_k_w", f"{tp}.relative_emb_k.weight",
                  _t_rel_w(num_heads, d_att, win2)))
    rules.append((f"{my}/relative_emb_k_b", f"{tp}.relative_emb_k.bias",
                  _t_rel_b(num_heads, win2)))
    rules.append((f"{my}/relative_emb_v", f"{tp}.relative_emb_v", None))
    _map_linear(f"{my}/projection", f"{tp}.projection", rules)


def _map_gated(my: str, tp: str, rules, use_linear: bool):
    if use_linear:
        _map_linear(f"{my}/linear_QK", f"{tp}.linear_QK", rules)
        for nm in ("V1", "V2", "U1", "U2"):
            _map_linear(f"{my}/linear_{nm}", f"{tp}.linear_{nm}", rules)
    _map_conv(f"{my}/dw_conv/DepthwiseConv5x5_0/Conv_0",
              f"{tp}.dw_conv.conv", rules, bias=False, dw=True)
    _map_linear(f"{my}/projection", f"{tp}.projection", rules)


def _map_local_gated(my: str, tp: str, rules, num_heads: int, d_att: int,
                     win2: int = 225):
    rules.append((f"{my}/relative_emb_k_w", f"{tp}.relative_emb_k.weight",
                  _t_rel_w(num_heads, d_att, win2)))
    rules.append((f"{my}/relative_emb_k_b", f"{tp}.relative_emb_k.bias",
                  _t_rel_b(num_heads, win2)))
    _map_conv(f"{my}/dw_conv/DepthwiseConv5x5_0/Conv_0",
              f"{tp}.dw_conv.conv", rules, bias=False, dw=True)
    _map_linear(f"{my}/projection", f"{tp}.projection", rules)


def _lstt_v1_rules(i: int, heads: int, d_model: int) -> List:
    my = f"lstt/block_{i}"
    tp = f"LSTT.layers.{i}"
    rules: List = []
    for n in ("norm1", "norm2", "norm3"):
        _map_norm(f"{my}/{n}", f"{tp}.{n}", rules)
    _map_linear(f"{my}/linear_Q", f"{tp}.linear_Q", rules)
    _map_linear(f"{my}/linear_V", f"{tp}.linear_V", rules)
    _map_mha(f"{my}/self_attn", f"{tp}.self_attn", rules, use_linear=True)
    _map_mha(f"{my}/long_term_attn", f"{tp}.long_term_attn", rules,
             use_linear=False)
    _map_local_attn(f"{my}/short_term_attn", f"{tp}.short_term_attn", rules,
                    heads, d_model // heads)
    _map_linear(f"{my}/ffn_linear1", f"{tp}.linear1", rules)
    _map_linear(f"{my}/ffn_linear2", f"{tp}.linear2", rules)
    _map_gn(f"{my}/ffn_act/GroupNorm_0", f"{tp}.activation.gn", rules)
    _map_conv(f"{my}/ffn_act/DepthwiseConv5x5_0/Conv_0",
              f"{tp}.activation.conv", rules, bias=False, dw=True)
    return rules


def _gpm_rules(i: int, heads: int, d_model: int) -> List:
    my = f"lstt/block_{i}"
    tp = f"LSTT.layers.{i}"
    d_att = d_model // 2 if heads == 1 else d_model // heads
    rules: List = []
    _map_norm(f"{my}/norm1", f"{tp}.norm1", rules)
    _map_norm(f"{my}/norm2", f"{tp}.norm2", rules)
    _map_norm(f"{my}/id_norm2", f"{tp}.id_norm2", rules)
    if i > 0:
        _map_norm(f"{my}/id_norm1", f"{tp}.id_norm1", rules)
        _map_linear(f"{my}/linear_ID_U", f"{tp}.linear_ID_U", rules)
    _map_linear(f"{my}/linear_QV", f"{tp}.linear_QV", rules)
    _map_linear(f"{my}/linear_U", f"{tp}.linear_U", rules)
    _map_linear(f"{my}/linear_ID_V", f"{tp}.linear_ID_V", rules)
    _map_gated(f"{my}/long_term_attn", f"{tp}.long_term_attn", rules,
               use_linear=False)
    _map_local_gated(f"{my}/short_term_attn", f"{tp}.short_term_attn", rules,
                     heads, d_att)
    _map_gated(f"{my}/self_attn", f"{tp}.self_attn", rules, use_linear=True)
    return rules


def _decoder_rules() -> List:
    rules: List = []
    my, tp = "decoder", "decoder"
    for name in ("conv_in", "conv_16x", "conv_8x", "conv_4x"):
        _map_conv(f"{my}/{name}/Conv_0", f"{tp}.{name}.conv", rules)
        _map_gn(f"{my}/{name}/GroupNorm_0", f"{tp}.{name}.gn", rules)
    for name in ("adapter_16x", "adapter_8x", "adapter_4x", "conv_out"):
        _map_conv(f"{my}/{name}", f"{tp}.{name}", rules)
    return rules


def _mobilenetv2_rules(prefix_my="encoder", prefix_t="encoder") -> List:
    """torchvision-style MobileNetV2 (reference: encoders/mobilenetv2.py)."""
    from aot_tpu.models.encoders.mobilenetv2 import _BLOCKS

    rules: List = []
    # stem + final ConvBNReLU: Sequential(conv, bn, relu)
    _map_conv(f"{prefix_my}/features_0/conv", f"{prefix_t}.features.0.0",
              rules, bias=False)
    _map_bn(f"{prefix_my}/features_0/bn", f"{prefix_t}.features.0.1", rules)
    for idx, (inp, oup, s, d, t) in enumerate(_BLOCKS, start=1):
        my = f"{prefix_my}/features_{idx}"
        tp = f"{prefix_t}.features.{idx}.conv"
        j = 0
        if t != 1:
            _map_conv(f"{my}/expand/conv", f"{tp}.{j}.0", rules, bias=False)
            _map_bn(f"{my}/expand/bn", f"{tp}.{j}.1", rules)
            j += 1
        _map_conv(f"{my}/depthwise/conv", f"{tp}.{j}.0", rules, bias=False,
                  dw=True)
        _map_bn(f"{my}/depthwise/bn", f"{tp}.{j}.1", rules)
        _map_conv(f"{my}/project", f"{tp}.{j + 1}", rules, bias=False)
        _map_bn(f"{my}/project_bn", f"{tp}.{j + 2}", rules)
    _map_conv(f"{prefix_my}/features_18/conv", f"{prefix_t}.features.18.0",
              rules, bias=False)
    _map_bn(f"{prefix_my}/features_18/bn", f"{prefix_t}.features.18.1", rules)
    return rules


def _resnet_rules(layers, prefix_my="encoder", prefix_t="encoder") -> List:
    rules: List = []
    _map_conv(f"{prefix_my}/conv1", f"{prefix_t}.conv1", rules, bias=False)
    _map_bn(f"{prefix_my}/bn1", f"{prefix_t}.bn1", rules)
    for li, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            my = f"{prefix_my}/layer{li}_{b}"
            tp = f"{prefix_t}.layer{li}.{b}"
            for c in (1, 2, 3):
                _map_conv(f"{my}/conv{c}", f"{tp}.conv{c}", rules, bias=False)
                _map_bn(f"{my}/bn{c}", f"{tp}.bn{c}", rules)
            if b == 0:
                _map_conv(f"{my}/downsample_conv", f"{tp}.downsample.0",
                          rules, bias=False)
                _map_bn(f"{my}/downsample_bn", f"{tp}.downsample.1", rules)
    return rules


def _map_raw_norm(my: str, tp: str, rules):
    """A bare flax nn.LayerNorm (scale/bias) <- torch LayerNorm."""
    rules.append((f"{my}/scale", f"{tp}.weight", None))
    rules.append((f"{my}/bias", f"{tp}.bias", None))


def _swin_rules(prefix_my="encoder", prefix_t="encoder",
                depths=(2, 2, 18), out_indices=(0, 1, 2)) -> List:
    rules: List = []
    _map_conv(f"{prefix_my}/patch_embed_proj", f"{prefix_t}.patch_embed.proj",
              rules)
    _map_raw_norm(f"{prefix_my}/patch_embed_norm",
                  f"{prefix_t}.patch_embed.norm", rules)
    for i, depth in enumerate(depths):
        for j in range(depth):
            my = f"{prefix_my}/layers_{i}_block_{j}"
            tp = f"{prefix_t}.layers.{i}.blocks.{j}"
            _map_raw_norm(f"{my}/norm1", f"{tp}.norm1", rules)
            _map_raw_norm(f"{my}/norm2", f"{tp}.norm2", rules)
            rules.append((f"{my}/attn/relative_position_bias_table",
                          f"{tp}.attn.relative_position_bias_table", None))
            _map_linear(f"{my}/attn/qkv", f"{tp}.attn.qkv", rules)
            _map_linear(f"{my}/attn/proj", f"{tp}.attn.proj", rules)
            _map_linear(f"{my}/mlp_fc1", f"{tp}.mlp.fc1", rules)
            _map_linear(f"{my}/mlp_fc2", f"{tp}.mlp.fc2", rules)
        if i < len(depths) - 1:
            my = f"{prefix_my}/layers_{i}_downsample"
            tp = f"{prefix_t}.layers.{i}.downsample"
            _map_raw_norm(f"{my}/norm", f"{tp}.norm", rules)
            _map_linear(f"{my}/reduction", f"{tp}.reduction", rules,
                        bias=False)
    for i in out_indices:
        _map_raw_norm(f"{prefix_my}/norm{i}", f"{prefix_t}.norm{i}", rules)
    return rules


def _mobilenetv3_rules(prefix_my="encoder", prefix_t="encoder") -> List:
    from aot_tpu.models.encoders.mobilenetv3 import _walk_cfgs

    rules: List = []
    _map_conv(f"{prefix_my}/features_0_conv", f"{prefix_t}.features.0.0",
              rules, bias=False)
    _map_bn(f"{prefix_my}/features_0_bn", f"{prefix_t}.features.0.1", rules)
    blocks, last_exp = _walk_cfgs(16)
    for idx, (k, exp, out, se, hs, s, d, inp) in enumerate(blocks, start=1):
        my = f"{prefix_my}/features_{idx}"
        tp = f"{prefix_t}.features.{idx}.conv"
        if inp == exp:  # dw-first branch (mobilenetv3.py:96-110)
            seq = [("dw", 0, True), ("dw_bn", 1, None)]
            se_i, pw_i = 3, 4
        else:
            seq = [("pw", 0, False), ("pw_bn", 1, None),
                   ("dw", 3, True), ("dw_bn", 4, None)]
            se_i, pw_i = 5, 7
        for name, i, dw in seq:
            if name.endswith("bn"):
                _map_bn(f"{my}/{name}", f"{tp}.{i}", rules)
            else:
                _map_conv(f"{my}/{name}", f"{tp}.{i}", rules, bias=False,
                          dw=dw)
        if se:
            _map_linear(f"{my}/se/fc1", f"{tp}.{se_i}.fc.0", rules)
            _map_linear(f"{my}/se/fc2", f"{tp}.{se_i}.fc.2", rules)
        _map_conv(f"{my}/pw_linear", f"{tp}.{pw_i}", rules, bias=False)
        _map_bn(f"{my}/pw_linear_bn", f"{tp}.{pw_i + 1}", rules)
    _map_conv(f"{prefix_my}/conv_conv", f"{prefix_t}.conv.0", rules,
              bias=False)
    _map_bn(f"{prefix_my}/conv_bn", f"{prefix_t}.conv.1", rules)
    return rules


def _resnest_rules(layers, prefix_my="encoder", prefix_t="encoder") -> List:
    rules: List = []
    # deep stem Sequential [conv, bn, relu, conv, bn, relu, conv]
    _map_conv(f"{prefix_my}/stem_conv1", f"{prefix_t}.conv1.0", rules,
              bias=False)
    _map_bn(f"{prefix_my}/stem_bn1", f"{prefix_t}.conv1.1", rules)
    _map_conv(f"{prefix_my}/stem_conv2", f"{prefix_t}.conv1.3", rules,
              bias=False)
    _map_bn(f"{prefix_my}/stem_bn2", f"{prefix_t}.conv1.4", rules)
    _map_conv(f"{prefix_my}/stem_conv3", f"{prefix_t}.conv1.6", rules,
              bias=False)
    _map_bn(f"{prefix_my}/bn1", f"{prefix_t}.bn1", rules)
    for li, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            my = f"{prefix_my}/layer{li}_{b}"
            tp = f"{prefix_t}.layer{li}.{b}"
            _map_conv(f"{my}/conv1", f"{tp}.conv1", rules, bias=False)
            _map_bn(f"{my}/bn1", f"{tp}.bn1", rules)
            _map_conv(f"{my}/conv2/conv", f"{tp}.conv2.conv", rules,
                      bias=False)
            _map_bn(f"{my}/conv2/bn0", f"{tp}.conv2.bn0", rules)
            # fc1/fc2 are 1x1 convs in torch -> Dense here
            rules.append((f"{my}/conv2/fc1/kernel", f"{tp}.conv2.fc1.weight",
                          _t_fc1x1))
            rules.append((f"{my}/conv2/fc1/bias", f"{tp}.conv2.fc1.bias",
                          None))
            _map_bn(f"{my}/conv2/bn1", f"{tp}.conv2.bn1", rules)
            rules.append((f"{my}/conv2/fc2/kernel", f"{tp}.conv2.fc2.weight",
                          _t_fc1x1))
            rules.append((f"{my}/conv2/fc2/bias", f"{tp}.conv2.fc2.bias",
                          None))
            _map_conv(f"{my}/conv3", f"{tp}.conv3", rules, bias=False)
            _map_bn(f"{my}/bn3", f"{tp}.bn3", rules)
            if b == 0:
                _map_conv(f"{my}/downsample_conv", f"{tp}.downsample.1",
                          rules, bias=False)
                _map_bn(f"{my}/downsample_bn", f"{tp}.downsample.2", rules)
    return rules


def build_rules(cfg) -> List:
    """Full model mapping for the reference's AOT/DeAOT checkpoints."""
    rules: List = []
    enc = cfg.MODEL_ENCODER
    if enc == "mobilenetv2":
        rules += _mobilenetv2_rules()
    elif enc in ("resnet50", "resnet101"):
        layers = (3, 4, 6) if enc == "resnet50" else (3, 4, 23)
        rules += _resnet_rules(layers)
    elif "swin" in enc:
        rules += _swin_rules()
    elif enc == "mobilenetv3":
        rules += _mobilenetv3_rules()
    elif enc.startswith("resnest"):
        layers = {"resnest50": (3, 4, 6), "resnest101": (3, 4, 23),
                  "resnest200": (3, 24, 36), "resnest269": (3, 30, 48)}[enc]
        rules += _resnest_rules(layers)

    _map_conv("encoder_projector", "encoder_projector", rules)
    _map_conv("patch_wise_id_bank", "patch_wise_id_bank", rules)

    d_model = cfg.MODEL_ENCODER_EMBEDDING_DIM
    heads = cfg.MODEL_ATT_HEADS
    n_layers = cfg.MODEL_LSTT_NUM
    is_deaot = cfg.MODEL_VOS == "deaot"
    for i in range(n_layers):
        rules += (_gpm_rules(i, heads, d_model) if is_deaot
                  else _lstt_v1_rules(i, heads, d_model))
    # decoder norms: LayerNorm for AOT, GroupNorm(2) for DeAOT
    n_norms = (n_layers - 1 if cfg.MODEL_DECODER_INTERMEDIATE_LSTT else 0) + 1
    for i in range(n_norms):
        if is_deaot:
            _map_gn(f"lstt/decoder_norm_{i}",
                    f"LSTT.decoder_norms.{i}.gn", rules)
        else:
            _map_norm(f"lstt/decoder_norm_{i}", f"LSTT.decoder_norms.{i}",
                      rules)
    if is_deaot:
        _map_norm("id_norm", "id_norm", rules)
    rules += _decoder_rules()
    return rules


def _flatten(tree) -> Dict[str, Any]:
    import jax

    out = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in kp)
        out[key] = leaf
    return out


def convert_state_dict(sd: Dict[str, np.ndarray], target_params, cfg,
                       encoder_only: bool = False):
    """Returns (params, missing_my_keys, unused_torch_keys)."""
    import jax

    rules = build_rules(cfg)
    tgt_flat = _flatten(target_params)
    new_flat = dict(tgt_flat)
    used = set()
    missing: List[str] = []

    rule_map = {my: (tk, tf) for my, tk, tf in rules}
    for my_key, tgt in tgt_flat.items():
        if encoder_only and not my_key.startswith("encoder"):
            continue
        hit = rule_map.get(my_key)
        if hit is None:
            missing.append(my_key)
            continue
        tk, tf = hit
        # encoder-only files (torchvision zoo) have no 'encoder.' prefix
        cand = sd.get(tk)
        if cand is None and tk.startswith("encoder."):
            cand = sd.get(tk[len("encoder."):])
        if cand is None:
            missing.append(my_key)
            continue
        val = tf(cand) if tf is not None else cand
        if np.shape(val) != np.shape(tgt):
            missing.append(my_key + f" (shape {np.shape(val)} vs "
                           f"{np.shape(tgt)})")
            continue
        new_flat[my_key] = np.asarray(val, np.float32)
        used.add(tk)

    leaves_paths = jax.tree_util.tree_flatten_with_path(target_params)
    keys = ["/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                     for k in kp) for kp, _ in leaves_paths[0]]
    params = jax.tree_util.tree_unflatten(
        leaves_paths[1], [new_flat[k] for k in keys])
    unused = [k for k in sd if k not in used
              and not any(s in k for s in (
                  "num_batches_tracked",
                  # deterministic swin buffers, recomputed on the fly here
                  "relative_position_index", "attn_mask"))]
    return params, missing, unused


def export_state_dict(params, cfg) -> Dict[str, np.ndarray]:
    """Invert the rule table: this framework's params -> a reference-keyed
    state_dict (the inverse of convert_state_dict). Keys/layouts match
    networks/* module names so the REFERENCE engine can load a TPU-trained
    checkpoint via its prefix-tolerant load_network
    (reference utils/checkpoint.py:94-121)."""
    rule_map = {my: (tk, tf) for my, tk, tf in build_rules(cfg)}
    flat = _flatten(params)
    sd: Dict[str, np.ndarray] = {}
    unmapped = []
    for my_key, leaf in flat.items():
        hit = rule_map.get(my_key)
        if hit is None:
            unmapped.append(my_key)
            continue
        tk, tf = hit
        v = np.asarray(leaf, np.float32)
        sd[tk] = tf.inv(v) if tf is not None else np.ascontiguousarray(v)
    return sd, unmapped


def save_torch_checkpoint(path: str, params, cfg, step: int = 0):
    """Write a reference-format checkpoint: torch.save({'state_dict': ...})
    named like save_step_{N}.pth (reference utils/checkpoint.py:124-141).
    Returns the list of params that had no reference counterpart."""
    import torch

    sd, unmapped = export_state_dict(params, cfg)
    blob = {"state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}}
    torch.save(blob, path)
    if unmapped:
        print(f"[torch_export] {len(unmapped)} params had no reference "
              f"counterpart, e.g. {unmapped[:5]}")
    return unmapped


def load_torch_pretrained(path: str, target_params, cfg,
                          encoder_only: bool = False):
    sd = load_state_dict(path)
    params, missing, unused = convert_state_dict(
        sd, target_params, cfg, encoder_only=encoder_only)
    if missing:
        print(f"[torch_import] {len(missing)} params kept at init, e.g. "
              f"{missing[:5]}")
    if unused:
        print(f"[torch_import] {len(unused)} torch keys unused, e.g. "
              f"{unused[:5]}")
    return params, missing
