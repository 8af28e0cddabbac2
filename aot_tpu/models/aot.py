"""AOT / DeAOT model assemblies (reference: networks/models/aot.py,
networks/models/deaot.py).

The model is a pure function library: the engine drives it through
`model.apply(..., method=...)` calls. Methods:

  encode_image(img)                  -> [x4, x8, x16, x16-projected] NHWC
  get_id_emb(one_hot)                -> (B, HW, C) identity embedding
  lstt_forward(emb16, lt, st, id, pos, size_2d) -> (intermediates, memories)
  decode_id_logits(intermediates, shortcuts)    -> (B, H4, W4, M+1)
  fuse_memory(layer_idx, mem, id_emb)           -> fused memory dict
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from aot_tpu.models import layers as L
from aot_tpu.models.decoders import FPNSegmentationHead
from aot_tpu.models.encoders import build_encoder
from aot_tpu.models.lstt import DualBranchGPM, LongShortTermTransformer
from aot_tpu.ops.position import sine_position_embedding_seq

Dtype = Any


def _id_bank_label_matmul(label, kernel, bias, pad: int, dtype):
    """Patch-wise id-bank conv (k=ks, s=16, p=pad) applied to
    one_hot(label), computed WITHOUT materializing the (B, H, W, M+1)
    one-hot: on TPU that NHWC layout pads the (M+1)=11-channel minor axis
    to 128 lanes, inflating HBM traffic ~11x — measured as the dominant
    cost of the fused eval step (2.75 ms of 5.2 ms at N=1). Here the
    label is reshaped into stride-16 blocks and one-hotted directly in a
    blocked layout whose channel axis folds into the matmul contraction
    dim (16*16*(M+1) = 2816 for k=17), so the MXU sees one clean matmul.

    k=17 overlaps neighbouring blocks by one row/col; the kernel splits
    into the 16x16 body + last-row + last-col + corner terms, each its
    own small matmul over a strided slice. Exactly equals the conv path
    (tests/test_id_bank.py pins conv==matmul).

    label: (B, H, W) int; kernel: (ks, ks, cin, co) HWIO; pad value -1
    one-hots to all-zeros, matching the conv's zero padding.
    """
    ks, _, cin, co = kernel.shape
    s = 16
    b, h, w = label.shape
    lab = label.astype(jnp.int32)
    if pad:
        lab = jnp.pad(lab, ((0, 0), (pad, pad), (pad, pad)),
                      constant_values=-1)
    nh = (h + 2 * pad - ks) // s + 1
    nw = (w + 2 * pad - ks) // s + 1
    k = kernel.astype(dtype)

    main = lab[:, :s * nh, :s * nw].reshape(b, nh, s, nw, s)
    main = main.transpose(0, 1, 3, 2, 4)                  # (B,nh,nw,16,16)
    oh = jax.nn.one_hot(main, cin, dtype=dtype)
    x = oh.reshape(b, nh * nw, s * s * cin) @ k[:s, :s].reshape(s * s * cin, co)
    if ks == s + 1:
        rows = lab[:, s:s * nh + 1:s, :s * nw]            # ky=16 term
        ohr = jax.nn.one_hot(rows.reshape(b, nh, nw, s), cin, dtype=dtype)
        x += ohr.reshape(b, nh * nw, s * cin) @ k[s, :s].reshape(s * cin, co)
        cols = lab[:, :s * nh, s:s * nw + 1:s]            # kx=16 term
        ohc = jax.nn.one_hot(
            cols.reshape(b, nh, s, nw).transpose(0, 1, 3, 2),
            cin, dtype=dtype)
        x += ohc.reshape(b, nh * nw, s * cin) @ k[:s, s].reshape(s * cin, co)
        corn = lab[:, s:s * nh + 1:s, s:s * nw + 1:s]     # corner term
        x += jax.nn.one_hot(corn, cin, dtype=dtype).reshape(
            b, nh * nw, cin) @ k[s, s]
    x = x + bias.astype(dtype)
    return x.reshape(b, nh, nw, co)


class PatchwiseIdBank(nn.Module):
    """Stride-16 conv over the (M+1)-channel one-hot mask (aot.py:50-63),
    with a fast label-input mode. Param tree identical to the nn.Conv it
    replaces ({kernel, bias} under the same module name), so checkpoints
    and the torch importer are untouched."""

    features: int
    cin: int
    ks: int
    pad: int
    kernel_init: Any
    bias_init: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, one_hot=None, *, label=None):
        kernel = self.param(
            "kernel", self.kernel_init,
            (self.ks, self.ks, self.cin, self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        if label is not None:
            return _id_bank_label_matmul(
                label, kernel, bias, self.pad, self.dtype)
        y = jax.lax.conv_general_dilated(
            one_hot.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(16, 16),
            padding=[(self.pad, self.pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(self.dtype)


def _orthogonal_rows(gain: float):
    """Orthogonal init over the flattened (O, I*kh*kw) view with scaling
    `gain` — the reference's patch_wise_id_bank init (aot.py:110-115)."""

    def init(key, shape, dtype=jnp.float32):  # HWIO
        kh, kw, i, o = shape
        n = kh * kw * i
        a = jax.random.normal(key, (max(n, o), min(n, o)), jnp.float32)
        q, r = jnp.linalg.qr(a)
        q = q * jnp.sign(jnp.diagonal(r))[None, :]
        if n < o:
            q = q.T
        return (gain * q).reshape(kh, kw, i, o).astype(dtype)

    return init


class AOT(nn.Module):
    """reference: networks/models/aot.py:9-115."""

    encoder_name: str = "mobilenetv2"
    encoder_dims: Sequence[int] = (24, 32, 96, 1280)
    emb_dim: int = 256
    max_obj_num: int = 10
    lstt_num: int = 1
    self_heads: int = 8
    att_heads: int = 8
    decoder_intermediate: bool = True
    align_corners: bool = True
    frozen_bn: bool = True
    emb_dropout: float = 0.0
    id_dropout: float = 0.0
    droppath: float = 0.1
    droppath_scaling: bool = False
    droppath_lst: bool = False
    lt_dropout: float = 0.0
    st_dropout: float = 0.0
    block_version: str = "v1"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = build_encoder(
            self.encoder_name, frozen_bn=self.frozen_bn, dtype=self.dtype)
        self.encoder_projector = nn.Conv(
            self.emb_dim, (1, 1), kernel_init=L.XAVIER,
            bias_init=L.torch_bias_init(self.encoder_dims[-1]),
            dtype=self.dtype, name="encoder_projector")
        self.lstt = self._make_lstt()
        self.decoder = FPNSegmentationHead(
            in_dim=self._decoder_indim(),
            out_dim=self.max_obj_num + 1,
            decode_intermediate_input=self.decoder_intermediate,
            hidden_dim=self.emb_dim,
            shortcut_dims=self.encoder_dims,
            align_corners=self.align_corners,
            dtype=self.dtype,
            name="decoder")
        # patch-wise identity bank (aot.py:50-63): stride-16 conv over the
        # (M+1)-channel one-hot mask; kernel 17/pad 8 when align_corners.
        ks = 17 if self.align_corners else 16
        self.patch_wise_id_bank = PatchwiseIdBank(
            features=self.emb_dim, cin=self.max_obj_num + 1,
            ks=ks, pad=8 if self.align_corners else 0,
            kernel_init=_orthogonal_rows(gain=ks ** -2),
            bias_init=L.torch_bias_init((self.max_obj_num + 1) * ks * ks),
            dtype=self.dtype, name="patch_wise_id_bank")
        self.id_drop = nn.Dropout(self.id_dropout)
        self._extra_setup()

    # --- hooks overridden by DeAOT ---
    def _make_lstt(self):
        return LongShortTermTransformer(
            num_layers=self.lstt_num,
            d_model=self.emb_dim,
            self_heads=self.self_heads,
            att_heads=self.att_heads,
            emb_dropout=self.emb_dropout,
            droppath=self.droppath,
            lt_dropout=self.lt_dropout,
            st_dropout=self.st_dropout,
            droppath_lst=self.droppath_lst,
            droppath_scaling=self.droppath_scaling,
            intermediate_norm=self.decoder_intermediate,
            final_norm=True,
            block_version=self.block_version,
            dtype=self.dtype,
            name="lstt")

    def _decoder_indim(self) -> int:
        if self.decoder_intermediate:
            return self.emb_dim * (self.lstt_num + 1)
        return self.emb_dim

    def _extra_setup(self):
        pass

    # --- public API (invoked through apply(..., method=...)) ---
    def encode_image(self, img: jax.Array):
        """img: (B, H, W, 3) normalised. Returns 4 feature maps, last one
        projected to emb_dim (aot.py:81-84)."""
        xs = self.encoder(img.astype(self.dtype))
        xs[-1] = self.encoder_projector(xs[-1])
        return xs

    def get_id_emb(self, one_hot: jax.Array, *, deterministic: bool = True):
        """one_hot: (B, H, W, M+1) -> (B, HW16, emb_dim) (aot.py:76-79)."""
        x = self.patch_wise_id_bank(one_hot.astype(self.dtype))
        return self._id_emb_post(x, deterministic)

    def get_id_emb_label(self, label: jax.Array, *,
                         deterministic: bool = True):
        """Identity embedding straight from an int label map (B, H, W) —
        same math as get_id_emb(one_hot_mask(label)) via the id bank's
        blocked-matmul mode (no lane-padded NHWC one-hot on TPU)."""
        if label.ndim == 4 and label.shape[-1] == 1:
            label = label[..., 0]
        x = self.patch_wise_id_bank(label=label)
        return self._id_emb_post(x, deterministic)

    def _id_emb_post(self, x, deterministic):
        x = self._id_post(x)
        x = self.id_drop(x, deterministic=deterministic)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)

    def _id_post(self, x):
        return x

    def get_pos_emb(self, size_2d: Tuple[int, int]) -> jax.Array:
        return sine_position_embedding_seq(size_2d[0], size_2d[1], self.emb_dim)

    def lstt_forward(
        self,
        emb16: jax.Array,
        lt_mems,
        st_mems,
        curr_id_emb,
        pos_emb,
        size_2d: Tuple[int, int],
        *,
        lt_valid_len=None,
        top_k: int = -1,
        max_mem_len_ratio: float = -1.0,
        deterministic: bool = True,
    ):
        """emb16: (B, H16, W16, C) projected feature -> token sequence ->
        LSTT stack (aot.py:94-108)."""
        b, h, w, c = emb16.shape
        tgt = emb16.reshape(b, h * w, c)
        return self.lstt(
            tgt, lt_mems, st_mems, curr_id_emb, pos_emb, size_2d,
            lt_valid_len=lt_valid_len, top_k=top_k,
            max_mem_len_ratio=max_mem_len_ratio, deterministic=deterministic)

    def decode_id_logits(self, lstt_intermediates, shortcuts):
        """(aot.py:86-92). Returns (B, H4, W4, M+1) fp32 logits."""
        b, h, w, c = shortcuts[-1].shape
        inputs = [shortcuts[-1]]
        for emb in lstt_intermediates:
            inputs.append(emb.reshape(b, h, w, -1))
        return self.decoder(inputs, shortcuts)

    def fuse_memory(self, layer_idx: int, key, value, id_emb):
        """Fuse a predicted mask's identity embedding into the stored memory
        (dispatches to the block's fuse_key_value_id)."""
        return self.lstt.fuse_key_value_id(layer_idx, key, value, id_emb)

    def __call__(self, img, one_hot, *, deterministic: bool = True):
        """Parameter-initialisation path: touches every submodule once
        (reference-frame forward + a propagate-style fuse + decode)."""
        xs = self.encode_image(img)
        size_2d = xs[-1].shape[1:3]
        id_emb = self.get_id_emb(one_hot, deterministic=deterministic)
        pos_emb = self.get_pos_emb(size_2d).astype(self.dtype)
        embs, mems = self.lstt_forward(
            xs[-1], None, None, id_emb, pos_emb, size_2d,
            deterministic=deterministic)
        logits = self.decode_id_logits(embs, xs)
        # touch fuse params not exercised by the ref-frame path (none for v1;
        # DeAOT's layer>0 linear_ID_U/id_norm1 need real tgt_id, which the
        # ref-frame pass already provides for num_layers>1).
        return logits, embs, mems


class DeAOT(AOT):
    """reference: networks/models/deaot.py:8-55."""

    def _make_lstt(self):
        return DualBranchGPM(
            num_layers=self.lstt_num,
            d_model=self.emb_dim,
            self_heads=self.self_heads,
            att_heads=self.att_heads,
            emb_dropout=self.emb_dropout,
            droppath=self.droppath,
            lt_dropout=self.lt_dropout,
            st_dropout=self.st_dropout,
            droppath_lst=self.droppath_lst,
            droppath_scaling=self.droppath_scaling,
            intermediate_norm=self.decoder_intermediate,
            final_norm=True,
            dtype=self.dtype,
            name="lstt")

    def _decoder_indim(self) -> int:
        if self.decoder_intermediate:
            return self.emb_dim * (self.lstt_num * 2 + 1)
        return self.emb_dim * 2

    def _extra_setup(self):
        self.id_norm = L.LayerNorm(name="id_norm")

    def _id_post(self, x):
        # LayerNorm on the id embedding (deaot.py:39,51-55)
        return self.id_norm(x)


def build_vos_model(cfg, eval_mode: bool = False):
    """Construct the model from a Config (reference:
    networks/models/__init__.py:5-11)."""
    dtype = jnp.dtype(cfg.TEST_DTYPE if eval_mode else cfg.TRAIN_DTYPE)
    cls = {"aot": AOT, "deaot": DeAOT}[cfg.MODEL_VOS]
    return cls(
        encoder_name=cfg.MODEL_ENCODER,
        encoder_dims=tuple(cfg.MODEL_ENCODER_DIM),
        emb_dim=cfg.MODEL_ENCODER_EMBEDDING_DIM,
        max_obj_num=cfg.MODEL_MAX_OBJ_NUM,
        lstt_num=cfg.MODEL_LSTT_NUM,
        self_heads=cfg.MODEL_SELF_HEADS,
        att_heads=cfg.MODEL_ATT_HEADS,
        decoder_intermediate=cfg.MODEL_DECODER_INTERMEDIATE_LSTT,
        align_corners=cfg.MODEL_ALIGN_CORNERS,
        # eval never updates BN: always build frozen — a trainable-BN ckpt's
        # batch_stats are folded into params at load (checkpoint.py)
        frozen_bn=cfg.MODEL_FREEZE_BN or eval_mode,
        emb_dropout=cfg.TRAIN_LSTT_EMB_DROPOUT,
        id_dropout=cfg.TRAIN_LSTT_ID_DROPOUT,
        droppath=cfg.TRAIN_LSTT_DROPPATH,
        droppath_scaling=cfg.TRAIN_LSTT_DROPPATH_SCALING,
        droppath_lst=cfg.TRAIN_LSTT_DROPPATH_LST,
        lt_dropout=cfg.TRAIN_LSTT_LT_DROPOUT,
        st_dropout=cfg.TRAIN_LSTT_ST_DROPOUT,
        dtype=dtype,
    )
