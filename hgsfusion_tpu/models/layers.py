"""Shared NN building blocks (flax.linen, NHWC).

Includes the masked batch norm that reproduces sparse BN1d semantics
(statistics over active sites only) — the key numerical subtlety when
replacing the reference's spconv encoder with dense TPU convolutions
(see SURVEY.md "Hard parts": pcnres18.py:123,168 + pillar_modules.py:23).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm with statistics over masked (active) elements only.

    Equivalent to torch nn.BatchNorm1d applied to the compacted active-site
    feature rows of a spconv SparseConvTensor. Running stats follow the torch
    convention new = (1 - momentum) * old + momentum * batch, with the
    *unbiased* batch variance stored (torch behavior) while the *biased*
    variance normalizes the batch.
    """

    features: int
    eps: float = 1e-3
    momentum: float = 0.01  # torch momentum (pcnres18 norm_cfg: eps 1e-3, momentum 0.01)

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool):
        """x: (..., C); mask: (..., 1) float/bool, broadcastable to x."""
        mask = mask.astype(x.dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            count = jnp.maximum(jnp.sum(mask, axis=reduce_axes).squeeze(), 1.0)
            mean = jnp.sum(xf * mask, axis=reduce_axes) / count
            var = jnp.sum(jnp.square(xf - mean) * mask, axis=reduce_axes) / count
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (x - mean.astype(x.dtype)) * jnp.asarray(
            1.0 / jnp.sqrt(var + self.eps), x.dtype
        ) * scale.astype(x.dtype) + bias.astype(x.dtype)
        return y


def batch_norm(features: int, eps: float = 1e-5, torch_momentum: float = 0.1,
               name=None):
    """Dense flax BatchNorm with torch-convention momentum."""
    return nn.BatchNorm(
        use_running_average=None,
        momentum=1.0 - torch_momentum,
        epsilon=eps,
        dtype=jnp.float32,
        name=name,
    )


class ConvBNReLU(nn.Module):
    """Conv2d -> BN -> ReLU (BasicBlock2D, pcdet/models/model_utils/basic_block_2d.py)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    dilation: int = 1
    use_bias: bool = True
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1  # torch convention
    dtype: object = None  # compute dtype (bf16 on TPU); params stay f32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = ((self.kernel_size[0] - 1) // 2 * self.dilation,
               (self.kernel_size[1] - 1) // 2 * self.dilation)
        x = nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=((pad[0], pad[0]), (pad[1], pad[1])),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.bn_momentum,
            epsilon=self.bn_eps,
            name="bn",
        )(x)
        return nn.relu(x)


class SEBlock(nn.Module):
    """Squeeze-and-excitation: gap -> 1x1 conv -> sigmoid scale.

    fusion_after_bev_se_direct.py SE_Block:5-14 (conv has bias, no reduction).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        att = jnp.mean(x, axis=(1, 2), keepdims=True)
        att = nn.Conv(self.features, kernel_size=(1, 1), use_bias=True, name="att_conv")(att)
        return x * nn.sigmoid(att)


def upsample_bilinear_align_corners(x, scale: int):
    """Bilinear x`scale` upsample with align_corners=True (NHWC).

    Matches nn.Upsample(scale_factor=s, mode='bilinear', align_corners=True)
    used by FPN_LSS (lss_fpn.py:24-25). Separable gather-lerp.
    """
    b, h, w, c = x.shape

    def axis_weights(n_in, n_out):
        if n_in == 1:
            idx0 = jnp.zeros(n_out, jnp.int32)
            return idx0, idx0, jnp.zeros(n_out, x.dtype)
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        i0 = jnp.floor(pos).astype(jnp.int32)
        i0 = jnp.clip(i0, 0, n_in - 2)
        t = (pos - i0).astype(x.dtype)
        return i0, i0 + 1, t

    h0, h1, th = axis_weights(h, h * scale)
    x = x[:, h0] * (1 - th)[None, :, None, None] + x[:, h1] * th[None, :, None, None]
    w0, w1, tw = axis_weights(w, w * scale)
    x = x[:, :, w0] * (1 - tw)[None, None, :, None] + x[:, :, w1] * tw[None, None, :, None]
    return x


def resize_bilinear(x, out_hw):
    """torch F.interpolate(mode='bilinear', align_corners=False) EXACT
    equivalent, both directions. Used where the reference calls plain
    F.interpolate (fusion_after_bev_se_direct.py:52,
    radar_occupancy_2d_v2.py:297).

    NOT jax.image.resize('linear'): that one low-pass-filters when
    DOWNSCALING (scaled kernel/anti-aliasing), while torch samples the 4
    neighbors of the half-pixel source coordinate unfiltered — and the
    flagship DSM fusion downscales the image BEV to the radar grid, so
    the difference is on the active path. Source coords are clamped to 0
    like torch's area_pixel_compute_source_index.
    """
    h, w = x.shape[1:3]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (oh, ow) == (h, w):
        return x

    def axis(n_in, n_out):
        src = jnp.maximum(
            (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (n_in / n_out)
            - 0.5, 0.0)
        i0 = jnp.minimum(jnp.floor(src).astype(jnp.int32), n_in - 1)
        i1 = jnp.minimum(i0 + 1, n_in - 1)
        return i0, i1, (src - i0).astype(x.dtype)

    y0, y1, ty = axis(h, oh)
    x0, x1, tx = axis(w, ow)
    r0 = x[:, y0]
    r1 = x[:, y1]
    rows = r0 + (r1 - r0) * ty[None, :, None, None]  # (B, oh, w, C)
    c0 = rows[:, :, x0]
    c1 = rows[:, :, x1]
    return c0 + (c1 - c0) * tx[None, None, :, None]
