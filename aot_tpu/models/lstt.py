"""Long Short-Term Transformer (AOT) and Dual-Branch Gated Propagation
Module (DeAOT) stacks.

Functional port of the reference semantics (networks/layers/transformer.py)
to flax, with the memory interface redesigned for static shapes:

  - long-term memory per layer: (k, v[, id_v]) with token dim = CAP*HW and an
    explicit `lt_valid_len` (live token count) instead of growing concats.
  - short-term memory per layer: (k, v[, id_v]) of the window frame.
  - blocks return their *unfused* current (k, v) projections; fusing the mask
    identity into memory (reference fuse_key_value_id, transformer.py:364-367,
    :486-494, :659-665) is a separate pure method so the engine can call it
    with predicted masks.

Memory pytrees are dicts so AOT (k, v) and DeAOT (k, v, id_v) share the
engine code.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from aot_tpu.models import layers as L
from aot_tpu.ops import attention as att_ops

Mem = Dict[str, jax.Array]
Dtype = Any


class LSTTBlockV1(nn.Module):
    """reference: transformer.py:258-372 (LongShortTermTransformerBlock)."""

    d_model: int
    self_heads: int = 8
    att_heads: int = 8
    dim_feedforward: int = 1024
    droppath: float = 0.1
    lt_dropout: float = 0.0
    st_dropout: float = 0.0
    droppath_lst: bool = False
    local_dilation: int = 1
    max_dis: int = 7
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm1 = L.LayerNorm()
        self.norm2 = L.LayerNorm()
        self.norm3 = L.LayerNorm()
        self.linear_Q = L.Linear(self.d_model, dtype=self.dtype)
        self.linear_V = L.Linear(self.d_model, dtype=self.dtype)
        self.self_attn = L.MultiheadAttention(
            self.d_model, self.self_heads, use_linear=True, dtype=self.dtype)
        self.long_term_attn = L.MultiheadAttention(
            self.d_model, self.att_heads, use_linear=False,
            dropout=self.lt_dropout, dtype=self.dtype)
        self.short_term_attn = L.MultiheadLocalAttention(
            self.d_model, self.att_heads, max_dis=self.max_dis,
            dilation=self.local_dilation, use_linear=False,
            dropout=self.st_dropout, dtype=self.dtype)
        self.ffn_linear1 = L.Linear(self.dim_feedforward, dtype=self.dtype)
        self.ffn_act = L.GNActDWConv2d(self.dim_feedforward, dtype=self.dtype)
        self.ffn_linear2 = L.Linear(self.d_model, dtype=self.dtype)
        self.dp = L.DropPath(self.droppath)
        self.lst_drop = nn.Dropout(max(self.lt_dropout, self.st_dropout))

    def fuse_key_value_id(self, key, value, id_emb) -> Mem:
        """V = linear_V(value + id_emb); K unchanged (transformer.py:364-367)."""
        return {"k": key, "v": self.linear_V(value + id_emb.astype(value.dtype))}

    def __call__(
        self,
        tgt: jax.Array,
        lt_mem: Optional[Mem],
        st_mem: Optional[Mem],
        curr_id_emb: Optional[jax.Array],
        self_pos: Optional[jax.Array],
        size_2d: Tuple[int, int],
        *,
        lt_valid_len=None,
        top_k: int = -1,
        max_mem_len_ratio: float = -1.0,
        deterministic: bool = True,
    ):
        # --- self attention ---
        _tgt = self.norm1(tgt)
        q = k = _tgt + self_pos.astype(_tgt.dtype) if self_pos is not None else _tgt
        tgt2 = self.self_attn(q, q, _tgt, deterministic=deterministic)
        tgt = tgt + self.dp(tgt2, deterministic=deterministic)

        # --- long/short-term attention ---
        _tgt = self.norm2(tgt)
        curr_q = self.linear_Q(_tgt)
        curr_k = curr_q
        curr_v = _tgt

        if curr_id_emb is not None:
            fused = self.fuse_key_value_id(curr_k, curr_v, curr_id_emb)
            global_k, global_v = fused["k"], fused["v"]
            local_k, local_v = global_k, global_v
            lt_valid_len = None
        else:
            global_k, global_v = lt_mem["k"], lt_mem["v"]
            local_k, local_v = st_mem["k"], st_mem["v"]

        tgt2 = self.long_term_attn(
            curr_q, global_k, global_v, valid_len=lt_valid_len, top_k=top_k,
            max_mem_len_ratio=max_mem_len_ratio, deterministic=deterministic)
        tgt3 = self.short_term_attn(
            curr_q, local_k, local_v, size_2d, deterministic=deterministic)

        if self.droppath_lst:
            tgt = tgt + self.dp(tgt2 + tgt3, deterministic=deterministic)
        else:
            tgt = tgt + self.lst_drop(tgt2 + tgt3, deterministic=deterministic)

        # --- FFN with depthwise-conv activation ---
        _tgt = self.norm3(tgt)
        tgt2 = self.ffn_linear2(self.ffn_act(self.ffn_linear1(_tgt), size_2d))
        tgt = tgt + self.dp(tgt2, deterministic=deterministic)

        mems = {
            "curr": {"k": curr_k, "v": curr_v},
            "global": {"k": global_k, "v": global_v},
        }
        return tgt, mems


class LSTTBlockV2(nn.Module):
    """reference: transformer.py:375-499 (shared QV projection; id fusion
    modulates K multiplicatively per head and V additively)."""

    d_model: int
    self_heads: int = 8
    att_heads: int = 8
    dim_feedforward: int = 1024
    droppath: float = 0.1
    lt_dropout: float = 0.0
    st_dropout: float = 0.0
    droppath_lst: bool = False
    local_dilation: int = 1
    max_dis: int = 7
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm1 = L.LayerNorm()
        self.norm2 = L.LayerNorm()
        self.norm3 = L.LayerNorm()
        self.linear_QV = L.Linear(2 * self.d_model, dtype=self.dtype)
        self.linear_ID_KV = L.Linear(self.d_model + self.att_heads, dtype=self.dtype)
        self.self_attn = L.MultiheadAttention(
            self.d_model, self.self_heads, use_linear=True, dtype=self.dtype)
        self.long_term_attn = L.MultiheadAttention(
            self.d_model, self.att_heads, use_linear=False,
            dropout=self.lt_dropout, dtype=self.dtype)
        self.short_term_attn = L.MultiheadLocalAttention(
            self.d_model, self.att_heads, max_dis=self.max_dis,
            dilation=self.local_dilation, use_linear=False,
            dropout=self.st_dropout, dtype=self.dtype)
        self.ffn_linear1 = L.Linear(self.dim_feedforward, dtype=self.dtype)
        self.ffn_act = L.GNActDWConv2d(self.dim_feedforward, dtype=self.dtype)
        self.ffn_linear2 = L.Linear(self.d_model, dtype=self.dtype)
        self.dp = L.DropPath(self.droppath)
        self.lst_drop = nn.Dropout(max(self.lt_dropout, self.st_dropout))

    def fuse_key_value_id(self, key, value, id_emb) -> Mem:
        """K *= (1 + tanh(ID_K)) per head; V += ID_V
        (transformer.py:486-494)."""
        id_kv = self.linear_ID_KV(id_emb.astype(key.dtype))
        id_k, id_v = id_kv[..., : self.att_heads], id_kv[..., self.att_heads:]
        b, l, c = key.shape
        kh = key.reshape(b, l, self.att_heads, c // self.att_heads)
        kh = kh * (1.0 + jnp.tanh(id_k))[..., None]
        return {"k": kh.reshape(b, l, c), "v": value + id_v}

    def __call__(
        self,
        tgt: jax.Array,
        lt_mem: Optional[Mem],
        st_mem: Optional[Mem],
        curr_id_emb: Optional[jax.Array],
        self_pos: Optional[jax.Array],
        size_2d: Tuple[int, int],
        *,
        lt_valid_len=None,
        top_k: int = -1,
        max_mem_len_ratio: float = -1.0,
        deterministic: bool = True,
    ):
        _tgt = self.norm1(tgt)
        q = _tgt + self_pos.astype(_tgt.dtype) if self_pos is not None else _tgt
        tgt2 = self.self_attn(q, q, _tgt, deterministic=deterministic)
        tgt = tgt + self.dp(tgt2, deterministic=deterministic)

        _tgt = self.norm2(tgt)
        qv = self.linear_QV(_tgt)
        curr_q = qv[..., : self.d_model]
        curr_k = curr_q
        curr_v = qv[..., self.d_model:]

        if curr_id_emb is not None:
            fused = self.fuse_key_value_id(curr_k, curr_v, curr_id_emb)
            global_k, global_v = fused["k"], fused["v"]
            local_k, local_v = global_k, global_v
            lt_valid_len = None
        else:
            global_k, global_v = lt_mem["k"], lt_mem["v"]
            local_k, local_v = st_mem["k"], st_mem["v"]

        tgt2 = self.long_term_attn(
            curr_q, global_k, global_v, valid_len=lt_valid_len, top_k=top_k,
            max_mem_len_ratio=max_mem_len_ratio, deterministic=deterministic)
        tgt3 = self.short_term_attn(
            curr_q, local_k, local_v, size_2d, deterministic=deterministic)

        if self.droppath_lst:
            tgt = tgt + self.dp(tgt2 + tgt3, deterministic=deterministic)
        else:
            tgt = tgt + self.lst_drop(tgt2 + tgt3, deterministic=deterministic)

        _tgt = self.norm3(tgt)
        tgt2 = self.ffn_linear2(self.ffn_act(self.ffn_linear1(_tgt), size_2d))
        tgt = tgt + self.dp(tgt2, deterministic=deterministic)

        mems = {
            "curr": {"k": curr_k, "v": curr_v},
            "global": {"k": global_k, "v": global_v},
        }
        return tgt, mems


class LongShortTermTransformer(nn.Module):
    """Stack of LSTT blocks with intermediate norms for the decoder
    (reference: transformer.py:33-140)."""

    num_layers: int = 2
    d_model: int = 256
    self_heads: int = 8
    att_heads: int = 8
    dim_feedforward: int = 1024
    emb_dropout: float = 0.0
    droppath: float = 0.1
    lt_dropout: float = 0.0
    st_dropout: float = 0.0
    droppath_lst: bool = False
    droppath_scaling: bool = False
    intermediate_norm: bool = True
    final_norm: bool = True
    block_version: str = "v1"
    dtype: Dtype = jnp.float32

    def setup(self):
        block_cls = {"v1": LSTTBlockV1, "v2": LSTTBlockV2}[self.block_version]
        blocks = []
        for idx in range(self.num_layers):
            if self.droppath_scaling:
                rate = 0.0 if self.num_layers == 1 else (
                    self.droppath * idx / (self.num_layers - 1))
            else:
                rate = self.droppath
            blocks.append(block_cls(
                d_model=self.d_model,
                self_heads=self.self_heads,
                att_heads=self.att_heads,
                dim_feedforward=self.dim_feedforward,
                droppath=rate,
                lt_dropout=self.lt_dropout,
                st_dropout=self.st_dropout,
                droppath_lst=self.droppath_lst,
                dtype=self.dtype,
                name=f"block_{idx}",
            ))
        self.layers = blocks
        num_norms = (self.num_layers - 1) if self.intermediate_norm else 0
        if self.final_norm:
            num_norms += 1
        self.decoder_norms = [
            L.LayerNorm(name=f"decoder_norm_{i}") for i in range(num_norms)
        ]
        self.emb_drop = nn.Dropout(self.emb_dropout)

    def fuse_key_value_id(self, layer_idx: int, key, value, id_emb) -> Mem:
        return self.layers[layer_idx].fuse_key_value_id(key, value, id_emb)

    def __call__(
        self,
        tgt: jax.Array,
        lt_mems: Optional[Sequence[Mem]],
        st_mems: Optional[Sequence[Mem]],
        curr_id_emb: Optional[jax.Array],
        self_pos: Optional[jax.Array],
        size_2d: Tuple[int, int],
        *,
        lt_valid_len=None,
        top_k: int = -1,
        max_mem_len_ratio: float = -1.0,
        deterministic: bool = True,
    ):
        output = self.emb_drop(tgt, deterministic=deterministic)
        intermediates = []
        memories = []
        for idx, layer in enumerate(self.layers):
            output, mems = layer(
                output,
                lt_mems[idx] if lt_mems is not None else None,
                st_mems[idx] if st_mems is not None else None,
                curr_id_emb,
                self_pos,
                size_2d,
                lt_valid_len=lt_valid_len,
                top_k=top_k,
                max_mem_len_ratio=max_mem_len_ratio,
                deterministic=deterministic,
            )
            intermediates.append(output)
            memories.append(mems)

        if self.decoder_norms:
            if self.final_norm:
                intermediates[-1] = self.decoder_norms[-1](intermediates[-1])
            if self.intermediate_norm:
                for idx in range(len(intermediates) - 1):
                    intermediates[idx] = self.decoder_norms[idx](intermediates[idx])

        return tuple(intermediates), tuple(memories)


class GatedPropagationModule(nn.Module):
    """DeAOT dual-branch block (reference: transformer.py:501-670)."""

    d_model: int
    self_heads: int = 1
    att_heads: int = 1
    dim_feedforward: int = 1024
    droppath: float = 0.1
    lt_dropout: float = 0.0
    st_dropout: float = 0.0
    droppath_lst: bool = False
    local_dilation: int = 1
    max_local_dis: int = 7
    layer_idx: int = 0
    expand_ratio: float = 2.0
    dtype: Dtype = jnp.float32

    def setup(self):
        d_model = self.d_model
        expand_d = int(d_model * self.expand_ratio)
        self.expand_d_model = expand_d
        d_att = d_model // 2 if self.att_heads == 1 else d_model // self.att_heads
        self.d_att = d_att

        self.norm1 = L.LayerNorm()
        self.linear_QV = L.Linear(d_att * self.att_heads + expand_d, dtype=self.dtype)
        self.linear_U = L.Linear(expand_d, dtype=self.dtype)
        if self.layer_idx == 0:
            self.linear_ID_V = L.Linear(expand_d, dtype=self.dtype)
        else:
            self.id_norm1 = L.LayerNorm()
            self.linear_ID_V = L.Linear(expand_d, dtype=self.dtype)
            self.linear_ID_U = L.Linear(expand_d, dtype=self.dtype)

        self.long_term_attn = L.GatedPropagation(
            d_qk=d_model, d_vu=d_model * 2, num_heads=self.att_heads,
            use_linear=False, d_att=d_att, expand_ratio=self.expand_ratio,
            dropout=self.lt_dropout, dtype=self.dtype)
        self.short_term_attn = L.LocalGatedPropagation(
            d_qk=d_model, d_vu=d_model * 2, num_heads=self.att_heads,
            d_att=d_att, max_dis=self.max_local_dis, dilation=self.local_dilation,
            use_linear=False, expand_ratio=self.expand_ratio,
            dropout=self.st_dropout, dtype=self.dtype)

        self.norm2 = L.LayerNorm()
        self.id_norm2 = L.LayerNorm()
        self.self_attn = L.GatedPropagation(
            d_qk=d_model * 2, d_vu=d_model * 2, num_heads=self.self_heads,
            d_att=d_att, use_linear=True, dtype=self.dtype)

        self.dp = L.DropPath(self.droppath)
        self.lst_drop = nn.Dropout(max(self.lt_dropout, self.st_dropout))

    def fuse_key_value_id(self, key, value, id_emb) -> Mem:
        """ID_V = silu(linear_ID_V([value, id_emb] or id_emb))
        (transformer.py:659-665). key is unused (ID_K is None)."""
        del key
        id_emb = id_emb.astype(self.dtype)
        if value is None:
            id_v = att_ops.silu(self.linear_ID_V(id_emb))
        else:
            id_v = att_ops.silu(
                self.linear_ID_V(jnp.concatenate([value, id_emb], axis=-1)))
        return {"id_v": id_v}

    def __call__(
        self,
        tgt: jax.Array,
        tgt_id: Optional[jax.Array],
        lt_mem: Optional[Mem],
        st_mem: Optional[Mem],
        curr_id_emb: Optional[jax.Array],
        self_pos: Optional[jax.Array],
        size_2d: Tuple[int, int],
        *,
        lt_valid_len=None,
        top_k: int = -1,
        max_mem_len_ratio: float = -1.0,
        deterministic: bool = True,
    ):
        del self_pos  # the reference GPM accepts but never uses self_pos
        d_model = self.d_model

        _tgt = self.norm1(tgt)
        qv = self.linear_QV(_tgt)
        curr_q = curr_k = qv[..., : self.d_att * self.att_heads]
        curr_v = att_ops.silu(qv[..., self.d_att * self.att_heads:])
        curr_u = self.linear_U(_tgt)

        if tgt_id is None:
            curr_id_v = None
            cat_curr_u = jnp.concatenate(
                [att_ops.silu(curr_u), jnp.ones_like(curr_u)], axis=-1)
        else:
            _tgt_id = self.id_norm1(tgt_id)
            curr_id_v = _tgt_id
            curr_id_u = self.linear_ID_U(_tgt_id)
            cat_curr_u = att_ops.silu(
                jnp.concatenate([curr_u, curr_id_u], axis=-1))

        if curr_id_emb is not None:
            global_k, global_v = curr_k, curr_v
            global_id_v = self.fuse_key_value_id(None, curr_id_v, curr_id_emb)["id_v"]
            local_k, local_v, local_id_v = global_k, global_v, global_id_v
            lt_valid_len = None
        else:
            global_k, global_v = lt_mem["k"], lt_mem["v"]
            global_id_v = lt_mem["id_v"]
            local_k, local_v = st_mem["k"], st_mem["v"]
            local_id_v = st_mem["id_v"]

        cat_global_v = jnp.concatenate([global_v, global_id_v], axis=-1)
        cat_local_v = jnp.concatenate([local_v, local_id_v], axis=-1)

        cat_tgt2 = self.long_term_attn(
            curr_q, global_k, cat_global_v, cat_curr_u, size_2d,
            valid_len=lt_valid_len, top_k=top_k,
            max_mem_len_ratio=max_mem_len_ratio, deterministic=deterministic)
        cat_tgt3 = self.short_term_attn(
            curr_q, local_k, cat_local_v, cat_curr_u, size_2d,
            deterministic=deterministic)

        tgt2, tgt_id2 = cat_tgt2[..., :d_model], cat_tgt2[..., d_model:]
        tgt3, tgt_id3 = cat_tgt3[..., :d_model], cat_tgt3[..., d_model:]

        if self.droppath_lst:
            tgt = tgt + self.dp(tgt2 + tgt3, deterministic=deterministic)
            delta_id = self.dp(tgt_id2 + tgt_id3, deterministic=deterministic)
        else:
            tgt = tgt + self.lst_drop(tgt2 + tgt3, deterministic=deterministic)
            delta_id = self.lst_drop(tgt_id2 + tgt_id3, deterministic=deterministic)
        tgt_id = delta_id if tgt_id is None else tgt_id + delta_id

        # gated self-attention over the concatenated dual branch
        _tgt = self.norm2(tgt)
        _tgt_id = self.id_norm2(tgt_id)
        qkvu = jnp.concatenate([_tgt, _tgt_id], axis=-1)
        cat_tgt2 = self.self_attn(
            qkvu, qkvu, qkvu, qkvu, size_2d, deterministic=deterministic)
        tgt2, tgt_id2 = cat_tgt2[..., :d_model], cat_tgt2[..., d_model:]
        tgt = tgt + self.dp(tgt2, deterministic=deterministic)
        tgt_id = tgt_id + self.dp(tgt_id2, deterministic=deterministic)

        mems = {
            "curr": {"k": curr_k, "v": curr_v, "id_v": curr_id_v},
            "global": {"k": global_k, "v": global_v, "id_v": global_id_v},
        }
        return tgt, tgt_id, mems


class DualBranchGPM(nn.Module):
    """Stack of GPM blocks; concatenated [visual, id] streams feed the decoder
    (reference: transformer.py:143-255)."""

    num_layers: int = 2
    d_model: int = 256
    self_heads: int = 1
    att_heads: int = 1
    dim_feedforward: int = 1024
    emb_dropout: float = 0.0
    droppath: float = 0.1
    lt_dropout: float = 0.0
    st_dropout: float = 0.0
    droppath_lst: bool = False
    droppath_scaling: bool = False
    intermediate_norm: bool = True
    final_norm: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        blocks = []
        for idx in range(self.num_layers):
            if self.droppath_scaling:
                rate = 0.0 if self.num_layers == 1 else (
                    self.droppath * idx / (self.num_layers - 1))
            else:
                rate = self.droppath
            blocks.append(GatedPropagationModule(
                d_model=self.d_model,
                self_heads=self.self_heads,
                att_heads=self.att_heads,
                dim_feedforward=self.dim_feedforward,
                droppath=rate,
                lt_dropout=self.lt_dropout,
                st_dropout=self.st_dropout,
                droppath_lst=self.droppath_lst,
                layer_idx=idx,
                dtype=self.dtype,
                name=f"block_{idx}",
            ))
        self.layers = blocks
        num_norms = (self.num_layers - 1) if self.intermediate_norm else 0
        if self.final_norm:
            num_norms += 1
        # GroupNorm(2) over the concatenated 2*d_model stream
        # (reference: transformer.py:194-200)
        self.decoder_norms = [
            L.GroupNorm(2, name=f"decoder_norm_{i}") for i in range(num_norms)
        ]
        self.emb_drop = nn.Dropout(self.emb_dropout)

    def fuse_key_value_id(self, layer_idx: int, key, value, id_emb) -> Mem:
        return self.layers[layer_idx].fuse_key_value_id(key, value, id_emb)

    def __call__(
        self,
        tgt: jax.Array,
        lt_mems: Optional[Sequence[Mem]],
        st_mems: Optional[Sequence[Mem]],
        curr_id_emb: Optional[jax.Array],
        self_pos: Optional[jax.Array],
        size_2d: Tuple[int, int],
        *,
        lt_valid_len=None,
        top_k: int = -1,
        max_mem_len_ratio: float = -1.0,
        deterministic: bool = True,
    ):
        output = self.emb_drop(tgt, deterministic=deterministic)
        output_id = None
        intermediates = []
        memories = []
        for idx, layer in enumerate(self.layers):
            output, output_id, mems = layer(
                output,
                output_id,
                lt_mems[idx] if lt_mems is not None else None,
                st_mems[idx] if st_mems is not None else None,
                curr_id_emb,
                self_pos,
                size_2d,
                lt_valid_len=lt_valid_len,
                top_k=top_k,
                max_mem_len_ratio=max_mem_len_ratio,
                deterministic=deterministic,
            )
            intermediates.append(jnp.concatenate([output, output_id], axis=-1))
            memories.append(mems)

        if self.decoder_norms:
            if self.final_norm:
                intermediates[-1] = self.decoder_norms[-1](intermediates[-1])
            if self.intermediate_norm:
                for idx in range(len(intermediates) - 1):
                    intermediates[idx] = self.decoder_norms[idx](intermediates[idx])

        return tuple(intermediates), tuple(memories)
