"""Swin Transformer image backbone + GeneralizedLSSFPN neck (flax, NHWC).

TPU-native equivalents of the reference's mmdet-derived modules:
- SwinTransformer: pcdet/models/backbones_image/swin.py:22-736
  (WindowMSA relative-position bias :39-124, ShiftWindowMSA cyclic shift +
  static attention mask :126-280, SwinBlock pre-LN residual :282-367,
  PatchEmbed/PatchMerging from model_utils/swin_utils.py:329-560).
- GeneralizedLSSFPN: backbones_image/img_neck/generalized_lss.py:7-77
  (top-down upsample -> concat -> 1x1 -> 3x3, BasicBlock2D units).

TPU-first notes: all window partitioning is static reshape/transpose
(image sizes are fixed, so padding and the shifted-window attention mask
are computed at trace time with numpy and baked in as constants); the
attention itself is plain batched matmul over (num_windows*B, 49, C) —
MXU-friendly without any masking gather. Weight layouts follow flax
conventions; the torch mapping lives in tests (unfold order of
PatchMerging is (C, kh, kw), swin_utils.py:530-537).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _rel_position_index(wh: int, ww: int) -> np.ndarray:
    """Relative-position index of WindowMSA (swin.py:62-67, 119-124)."""
    seq1 = np.arange(0, (2 * ww - 1) * wh, 2 * ww - 1)
    seq2 = np.arange(0, ww)
    coords = (seq1[:, None] + seq2[None, :]).reshape(1, -1)
    idx = coords + coords.T
    return idx[:, ::-1].copy()  # flip(1)


def _shift_attn_mask(h_pad: int, w_pad: int, window: int,
                     shift: int) -> np.ndarray:
    """Static SW-MSA attention mask (swin.py:192-213): (nW, N, N) with 0 on
    same-region pairs and -100 across the cyclic-shift seams."""
    img = np.zeros((h_pad, w_pad), np.float32)
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    m = img.reshape(h_pad // window, window, w_pad // window, window)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window * window)
    attn = m[:, None, :] - m[:, :, None]
    return np.where(attn != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x, window: int):
    """(B, H, W, C) -> (B*nW, window*window, C), H/W multiples of window."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, window * window, c)


def _window_reverse(x, window: int, h: int, w: int):
    b = x.shape[0] // ((h // window) * (w // window))
    x = x.reshape(b, h // window, w // window, window, window, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, x.shape[-1])


class DropPath(nn.Module):
    """Per-sample stochastic depth (swin_utils.DropPath); identity in eval."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool):
        if not train or self.rate <= 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class WindowMSA(nn.Module):
    """W-MSA with relative position bias (swin.py:22-124)."""

    embed_dims: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, mask: np.ndarray | None):
        b, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = hd ** -0.5
        ws = self.window_size

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), nh),
        )
        rel_idx = _rel_position_index(ws, ws).reshape(-1)

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, nh, hd)
        attn = jnp.einsum(
            "bqhd,bkhd->bhqk", q * scale, k,
            preferred_element_type=jnp.float32,
        )
        rel_bias = bias_table[rel_idx].reshape(n, n, nh)
        attn = attn + jnp.transpose(rel_bias, (2, 0, 1))[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b // nw, nw, nh, n, n)
            attn = attn + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(b, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, v.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(
            out.astype(self.dtype))


class ShiftWindowMSA(nn.Module):
    """(S)W-MSA over a padded/cyclically shifted map (swin.py:126-280)."""

    embed_dims: int
    num_heads: int
    window_size: int
    shift_size: int
    drop_path: float = 0.0
    qkv_bias: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, hw_shape: Tuple[int, int], train: bool):
        b, l, c = x.shape
        h, w = hw_shape
        win = self.window_size
        x = x.reshape(b, h, w, c)
        pad_r = (win - w % win) % win
        pad_b = (win - h % win) % win
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if self.shift_size > 0:
            x = jnp.roll(x, (-self.shift_size, -self.shift_size), axis=(1, 2))
            mask = _shift_attn_mask(hp, wp, win, self.shift_size)
        else:
            mask = None
        windows = _window_partition(x, win)
        attn = WindowMSA(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            window_size=win, qkv_bias=self.qkv_bias, dtype=self.dtype,
            name="w_msa",
        )(windows, mask)
        x = _window_reverse(attn, win, hp, wp)
        if self.shift_size > 0:
            x = jnp.roll(x, (self.shift_size, self.shift_size), axis=(1, 2))
        x = x[:, :h, :w]
        x = x.reshape(b, h * w, c)
        return DropPath(self.drop_path, name="drop_path")(x, train)


class SwinFFN(nn.Module):
    """2-fc GELU FFN (swin_utils.FFN:155-221); identity added by caller."""

    feedforward_channels: int
    embed_dims: int
    drop_path: float = 0.0
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Dense(self.feedforward_channels, dtype=self.dtype,
                     name="fc1")(x)
        y = nn.gelu(y.astype(jnp.float32), approximate=False).astype(
            self.dtype)
        y = nn.Dense(self.embed_dims, dtype=self.dtype, name="fc2")(y)
        return DropPath(self.drop_path, name="drop_path")(y, train)


class SwinBlock(nn.Module):
    """Pre-LN attention + FFN residual block (swin.py:282-367)."""

    embed_dims: int
    num_heads: int
    feedforward_channels: int
    window_size: int = 7
    shift: bool = False
    drop_path: float = 0.0
    qkv_bias: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, hw_shape, train: bool):
        identity = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        y = ShiftWindowMSA(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            window_size=self.window_size,
            shift_size=self.window_size // 2 if self.shift else 0,
            drop_path=self.drop_path, qkv_bias=self.qkv_bias,
            dtype=self.dtype, name="attn",
        )(y, hw_shape, train)
        x = identity + y
        identity = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = SwinFFN(
            feedforward_channels=self.feedforward_channels,
            embed_dims=self.embed_dims, drop_path=self.drop_path,
            dtype=self.dtype, name="ffn",
        )(y, train)
        return identity + y


class PatchEmbed(nn.Module):
    """Non-overlapping conv patchify + LN (swin_utils.PatchEmbed:329-454).

    'corner' adaptive padding = pad bottom/right to a stride multiple.
    """

    embed_dims: int
    patch_size: int = 4
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        p = self.patch_size
        x = jnp.pad(
            x, ((0, 0), (0, (p - h % p) % p), (0, (p - w % p) % p), (0, 0)))
        x = nn.Conv(
            self.embed_dims, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="projection",
        )(x)
        hw = (x.shape[1], x.shape[2])
        x = x.reshape(b, hw[0] * hw[1], self.embed_dims)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x), hw


class PatchMerging(nn.Module):
    """2x2 unfold -> LN -> linear 4C->2C (swin_utils.PatchMerging:456-560).

    Unfold sample order is (C, kh, kw) — the reshape below matches the
    torch nn.Unfold channel layout so reduction weights copy verbatim.
    """

    out_channels: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, hw_shape):
        b, l, c = x.shape
        h, w = hw_shape
        x = x.reshape(b, h, w, c)
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        h2, w2 = x.shape[1] // 2, x.shape[2] // 2
        x = x.reshape(b, h2, 2, w2, 2, c)
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # (b, h2, w2, c, kh, kw)
        x = x.reshape(b, h2 * w2, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype,
                     name="reduction")(x)
        return x, (h2, w2)


class SwinTransformer(nn.Module):
    """Hierarchical Swin backbone (swin.py:451-736).

    Input (B, H, W, 3) NHWC; returns a list of NHWC stage features at
    out_indices (strides 4*2^i), each LayerNormed (swin.py:729-734).
    """

    embed_dims: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: int = 4
    out_indices: Sequence[int] = (1, 2, 3)
    drop_path_rate: float = 0.2
    patch_size: int = 4
    qkv_bias: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool):
        b = images.shape[0]
        x, hw = PatchEmbed(
            embed_dims=self.embed_dims, patch_size=self.patch_size,
            dtype=self.dtype, name="patch_embed",
        )(images)

        total_depth = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total_depth)
        outs = []
        dims = self.embed_dims
        di = 0
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                x = SwinBlock(
                    embed_dims=dims, num_heads=self.num_heads[si],
                    feedforward_channels=self.mlp_ratio * dims,
                    window_size=self.window_size, shift=bi % 2 == 1,
                    drop_path=float(dpr[di]), qkv_bias=self.qkv_bias,
                    dtype=self.dtype, name=f"stage{si}_block{bi}",
                )(x, hw, train)
                di += 1
            if si in self.out_indices:
                out = nn.LayerNorm(epsilon=1e-5, name=f"norm{si}")(x)
                outs.append(out.reshape(b, hw[0], hw[1], dims))
            if si < len(self.depths) - 1:
                x, hw = PatchMerging(
                    out_channels=2 * dims, dtype=self.dtype,
                    name=f"downsample{si}",
                )(x, hw)
                dims *= 2
        return outs


class GeneralizedLSSFPN(nn.Module):
    """Top-down FPN with concat fusion (generalized_lss.py:7-77).

    For n inputs produces n-1 outputs: level i = conv3x3(conv1x1(cat(
    input_i, upsample(level_{i+1} or input_n-1)))).
    """

    out_channels: int = 256
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool):
        from .layers import ConvBNReLU, resize_bilinear

        n = len(inputs)
        laterals = list(inputs)
        for i in range(n - 2, -1, -1):
            up = resize_bilinear(laterals[i + 1], laterals[i].shape[1:3])
            y = jnp.concatenate([laterals[i], up], axis=-1)
            y = ConvBNReLU(
                self.out_channels, kernel_size=(1, 1), use_bias=False,
                dtype=self.dtype, name=f"lateral_{i}",
            )(y, train)
            laterals[i] = ConvBNReLU(
                self.out_channels, kernel_size=(3, 3), use_bias=False,
                dtype=self.dtype, name=f"fpn_{i}",
            )(y, train)
        return tuple(laterals[: n - 1])
