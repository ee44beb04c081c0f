"""Modulated deformable convolution (DCNv2) — TPU-native via bilinear gather.

Equivalent of mmcv's `ModulatedDeformConv2dPack` as used by the reference's
parallel-ASPP occupancy variant (radar_occupancy_2d_v2.py:6,215-243). An
internal 3x3 conv predicts per-output-pixel offsets (2 per kernel tap) and
modulation masks (1 per tap, sigmoid); each tap samples the input at
base + dilation*offset_grid + learned offset with bilinear interpolation
(zeros padding), is scaled by its mask, and the taps are contracted with
the kernel weights in one einsum on the MXU. The offset/mask conv is
zero-initialized (the mmcv *Pack convention), so at init the op equals a
standard (dilated) convolution with half-weight masks — sigmoid(0) = 0.5,
matching mmcv's behavior exactly.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .grid_sample import grid_sample_2d


class ModulatedDeformConv2d(nn.Module):
    features: int
    kernel_size: int = 3
    dilation: int = 1
    use_bias: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> (B, H, W, features); stride 1, 'same' padding
        (the reference's pad = dilation keeps H, W)."""
        b, h, w, c = x.shape
        k = self.kernel_size
        nk = k * k

        # offset/mask predictor (conv_offset in mmcv; zero-init weights+bias)
        om = nn.Conv(
            3 * nk, (k, k),
            padding=((self.dilation * (k // 2),) * 2,) * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=True,
            kernel_init=nn.initializers.zeros_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv_offset",
        )(x)
        # mmcv layout: channels [0:2nk] are per-tap INTERLEAVED offsets
        # (dy_k at 2k, dx_k at 2k+1 — the Pack's chunk(3)+cat(o1,o2) is an
        # identity permutation) and [2nk:3nk] are the masks
        off_y = om[..., 0:2 * nk:2]
        off_x = om[..., 1:2 * nk:2]
        mask = nn.sigmoid(om[..., 2 * nk:3 * nk])

        # base sampling positions: output pixel + dilated kernel grid
        half = k // 2
        taps = jnp.arange(-half, half + 1, dtype=jnp.float32) * self.dilation
        base_yy, base_xx = jnp.meshgrid(taps, taps, indexing="ij")
        ys = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
        py = ys + base_yy.reshape(-1)[None, None, None, :] + off_y
        px = xs + base_xx.reshape(-1)[None, None, None, :] + off_x

        # normalize to align_corners=True coords for grid_sample_2d
        u = px / max(w - 1, 1) * 2.0 - 1.0
        v = py / max(h - 1, 1) * 2.0 - 1.0
        coords = jnp.stack([u, v], axis=-1).reshape(b, h * w * nk, 2)
        sampled = grid_sample_2d(x, coords).reshape(b, h, w, nk, c)
        sampled = sampled * mask[..., None]

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (nk, c, self.features),
        )
        cdt = self.dtype or x.dtype
        out = jnp.einsum(
            "bhwkc,kco->bhwo", sampled.astype(cdt), kernel.astype(cdt),
            preferred_element_type=jnp.float32,
        ).astype(cdt)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(cdt)
        return out
