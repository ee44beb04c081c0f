"""Bilinear grid sampling (align_corners=True, zeros padding), NHWC layout.

TPU-native equivalent of `F.grid_sample(..., align_corners=True,
padding_mode='zeros')` as used by the frustum view transform
(pcdet/.../f2v/sampler.py:8-37). The reference samples a (B, C, 1, H, W)
volume with a 3-D grid whose depth size is 1; with align_corners=True the
depth coordinate then unnormalizes to exactly 0 for *any* value, so it is
ignored — the op reduces to a 2-D bilinear sample of (u, v). We implement
that 2-D sample directly.
"""
from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord, size: int):
    """align_corners=True: [-1, 1] -> [0, size-1]."""
    return (coord + 1.0) * 0.5 * (size - 1)


def grid_sample_2d(features, coords):
    """Bilinear sample with zero padding.

    Args:
      features: (B, H, W, C).
      coords: (B, ..., 2) with last dim (x, y) in [-1, 1]; x indexes W, y
        indexes H (matching torch grid_sample's grid ordering).
    Returns:
      (B, ..., C) sampled features.
    """
    b, h, w, c = features.shape
    out_shape = coords.shape[:-1] + (c,)
    coords = coords.reshape(b, -1, 2)

    ix = _unnormalize(coords[..., 0], w)
    iy = _unnormalize(coords[..., 1], h)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = ix - ix0
    ty = iy - iy0

    def tap(x_idx, y_idx, weight):
        in_bounds = (x_idx >= 0) & (x_idx <= w - 1) & (y_idx >= 0) & (y_idx <= h - 1)
        xc = jnp.clip(x_idx, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(y_idx, 0, h - 1).astype(jnp.int32)
        flat = yc * w + xc  # (B, P)
        gathered = jnp.take_along_axis(
            features.reshape(b, h * w, c), flat[..., None], axis=1
        )
        wgt = (
            weight.astype(features.dtype) * in_bounds.astype(features.dtype)
        )[..., None]
        return gathered * wgt

    out = (
        tap(ix0, iy0, (1 - tx) * (1 - ty))
        + tap(ix0 + 1, iy0, tx * (1 - ty))
        + tap(ix0, iy0 + 1, (1 - tx) * ty)
        + tap(ix0 + 1, iy0 + 1, tx * ty)
    )
    return out.reshape(out_shape)
