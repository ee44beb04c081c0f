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

from functools import partial

import jax
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


def grid_sample_2d_paired(features, coords):
    """grid_sample_2d with half the gathers: gather-count-optimized variant.

    Pre-pairs the feature map with its u-shifted copy (zero-filled at the
    right edge) so a single row gather fetches both u-taps; only the two
    v-taps remain as separate gathers. TPU gathers are dominated by per-row
    overhead, so 2 fat gathers beat 4 thin ones. Numerically identical to
    grid_sample_2d (tested).
    """
    b, h, w, c = features.shape
    out_shape = coords.shape[:-1] + (c,)
    coords = coords.reshape(b, -1, 2)

    # zero-pad one column on each side, then pair each column with its right
    # neighbor: paired[x] = [Fp[x], Fp[x+1]] for x in [0, w]; indexing with
    # xp = ix0 + 1 makes both u-taps correct at the borders without clamping
    # misalignment (the pad supplies the zeros the 'zeros' padding mode needs)
    wp = w + 1
    fp = jnp.pad(features, ((0, 0), (0, 0), (1, 1), (0, 0)))
    paired = jnp.concatenate([fp[:, :, :-1], fp[:, :, 1:]], axis=-1)
    paired = paired.reshape(b, h * wp, 2 * c)

    ix = _unnormalize(coords[..., 0], w)
    iy = _unnormalize(coords[..., 1], h)
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = (ix - ix0).astype(features.dtype)
    ty = (iy - iy0).astype(features.dtype)

    in_x0 = (ix0 >= 0) & (ix0 <= w - 1)
    in_x1 = (ix0 + 1 >= 0) & (ix0 + 1 <= w - 1)
    xp = jnp.clip(ix0 + 1, 0, wp - 1).astype(jnp.int32)

    def vrow(y_idx):
        in_y = (y_idx >= 0) & (y_idx <= h - 1)
        yc = jnp.clip(y_idx, 0, h - 1).astype(jnp.int32)
        row = jnp.take_along_axis(paired, (yc * wp + xp)[..., None], axis=1)
        w0 = ((1 - tx) * in_x0.astype(features.dtype)
              * in_y.astype(features.dtype))[..., None]
        w1 = (tx * in_x1.astype(features.dtype)
              * in_y.astype(features.dtype))[..., None]
        return row[..., :c] * w0 + row[..., c:] * w1

    out = vrow(iy0) * (1 - ty)[..., None] + vrow(iy0 + 1) * ty[..., None]
    return out.reshape(out_shape)


def grid_sample_2d_quad(features, coords):
    """grid_sample_2d with ONE gather per sample.

    Pre-builds a 2x2-patch tensor (4C channels) over a zero-padded map so a
    single row gather fetches all four bilinear taps. TPU gather cost is
    dominated by per-row overhead, so 1 fat gather beats 4 thin ones; the 4x
    patch tensor is built once per frame with cheap shifts. Numerically
    identical to grid_sample_2d (tested).
    """
    b, h, w, c = features.shape
    out_shape = coords.shape[:-1] + (c,)
    coords = coords.reshape(b, -1, 2)

    hp, wp = h + 1, w + 1
    fp = jnp.pad(features, ((0, 0), (1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate(
        [
            fp[:, :-1, :-1], fp[:, :-1, 1:],  # (y0, x0), (y0, x1)
            fp[:, 1:, :-1], fp[:, 1:, 1:],    # (y1, x0), (y1, x1)
        ],
        axis=-1,
    ).reshape(b, hp * wp, 4 * c)

    ix = _unnormalize(coords[..., 0], w)
    iy = _unnormalize(coords[..., 1], h)
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = (ix - ix0).astype(features.dtype)
    ty = (iy - iy0).astype(features.dtype)

    def inb(v, n):
        return ((v >= 0) & (v <= n - 1)).astype(features.dtype)

    mx0, mx1 = inb(ix0, w), inb(ix0 + 1, w)
    my0, my1 = inb(iy0, h), inb(iy0 + 1, h)
    xp = jnp.clip(ix0 + 1, 0, wp - 1).astype(jnp.int32)
    yp = jnp.clip(iy0 + 1, 0, hp - 1).astype(jnp.int32)

    rows = jnp.take_along_axis(quad, (yp * wp + xp)[..., None], axis=1)
    w00 = ((1 - tx) * (1 - ty) * mx0 * my0)[..., None]
    w01 = (tx * (1 - ty) * mx1 * my0)[..., None]
    w10 = ((1 - tx) * ty * mx0 * my1)[..., None]
    w11 = (tx * ty * mx1 * my1)[..., None]
    out = (
        rows[..., 0 * c : 1 * c] * w00
        + rows[..., 1 * c : 2 * c] * w01
        + rows[..., 2 * c : 3 * c] * w10
        + rows[..., 3 * c : 4 * c] * w11
    )
    return out.reshape(out_shape)


def quantize_per_channel_int8(features):
    """Symmetric per-channel int8 quantization of a feature map.

    Returns (q int8 (B, H, W, C), scale f32 (C,)) with q = round(f / scale)
    clipped to [-127, 127] and scale = max|f| / 127 per channel. Exact-range:
    the scale is computed from the map itself, so the only error is the
    0.5-ulp rounding (|f - q*scale| <= scale/2).
    """
    f32 = features.astype(jnp.float32)
    amax = jnp.max(jnp.abs(f32), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(f32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quad_idx_weights(coords, h, w, dtype):
    """Shared quad-gather indexing: flat padded-map row index + 4 bilinear
    tap weights (zeros-padding masks folded in)."""
    hp, wp = h + 1, w + 1
    ix = _unnormalize(coords[..., 0], w)
    iy = _unnormalize(coords[..., 1], h)
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = (ix - ix0).astype(dtype)
    ty = (iy - iy0).astype(dtype)

    def inb(v, n):
        return ((v >= 0) & (v <= n - 1)).astype(dtype)

    mx0, mx1 = inb(ix0, w), inb(ix0 + 1, w)
    my0, my1 = inb(iy0, h), inb(iy0 + 1, h)
    xp = jnp.clip(ix0 + 1, 0, wp - 1).astype(jnp.int32)
    yp = jnp.clip(iy0 + 1, 0, hp - 1).astype(jnp.int32)
    flat = yp * wp + xp
    w4 = (
        (1 - tx) * (1 - ty) * mx0 * my0,
        tx * (1 - ty) * mx1 * my0,
        (1 - tx) * ty * mx0 * my1,
        tx * ty * mx1 * my1,
    )
    return flat, w4


def _q8_sample_impl(features, coords, compute_dtype):
    """int8-payload quad sample: returns (out_unscaled, scale).

    out_unscaled = sum_tap w_tap * q_tap in compute_dtype. The int8 payload
    values q_tap (magnitudes <= 127) are exact in bfloat16; the tap weights
    are fractional, so the combine itself rounds exactly like the bf16
    exact-path combine (same numerics, smaller gather payload). The caller
    dequantizes by folding `scale` (C,) into whatever linear op consumes the samples
    (e.g. kernel_rows * scale[:, None]); dequantization commutes with the
    bilinear tap combine because the scale is per-channel.
    """
    b, h, w, c = features.shape
    out_shape = coords.shape[:-1] + (c,)
    coords = coords.reshape(b, -1, 2)

    q, scale = quantize_per_channel_int8(features)
    fp = jnp.pad(q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate(
        [fp[:, :-1, :-1], fp[:, :-1, 1:], fp[:, 1:, :-1], fp[:, 1:, 1:]],
        axis=-1,
    ).reshape(b, (h + 1) * (w + 1), 4 * c)

    flat, w4 = _quad_idx_weights(coords, h, w, compute_dtype)
    rows = jnp.take_along_axis(quad, flat[..., None], axis=1)
    rows = rows.astype(compute_dtype)  # fused into the tap combine by XLA
    out = (
        rows[..., 0 * c : 1 * c] * w4[0][..., None]
        + rows[..., 1 * c : 2 * c] * w4[1][..., None]
        + rows[..., 2 * c : 3 * c] * w4[2][..., None]
        + rows[..., 3 * c : 4 * c] * w4[3][..., None]
    )
    return out.reshape(out_shape), scale


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def grid_sample_2d_quad_q8(features, coords, compute_dtype=jnp.bfloat16):
    """One-gather bilinear sample with an int8-quantized payload.

    Halves the gathered bytes vs a bf16 quad map (the f2v gather is
    HBM-bandwidth-bound at 1536 B rows, BASELINE.md); per-channel scales are
    returned for the caller to fold into the consuming matmul, so the only
    approximation is the 0.5-ulp int8 rounding of the source map.

    Gradient: straight-through — the backward pass is the exact (bf16)
    bilinear-sample VJP of the unquantized map, rescaled by 1/scale to match
    the unscaled forward output. Training with the quantized forward
    therefore sees the same cotangent scatter as the exact path.

    Returns (out_unscaled (..., C), scale (C,)).
    """
    return _q8_sample_impl(features, coords, compute_dtype)


def _q8_fwd(features, coords, compute_dtype):
    out, scale = _q8_sample_impl(features, coords, compute_dtype)
    return (out, scale), (features, coords, scale)


def _q8_bwd(compute_dtype, res, cts):
    ct_out, _ct_scale = cts
    features, coords, scale = res
    # exact-sampler VJP (sample is linear per channel; forward output is
    # sample(f)/scale, so the cotangent is rescaled by 1/scale)
    _, vjp = jax.vjp(
        lambda f: grid_sample_2d_quad(f.astype(compute_dtype), coords),
        features,
    )
    (ct_f,) = vjp(ct_out / scale.astype(ct_out.dtype))
    return ct_f, None


grid_sample_2d_quad_q8.defvjp(_q8_fwd, _q8_bwd)


def grid_sample_2d_quad_taps(features, coords):
    """Quad gather returning the four taps and their bilinear weights.

    Returns (rows (..., 4, C), weights (..., 4)) so callers can apply
    per-tap nonlinear combinations (e.g. the depth-weighted frustum product,
    where bilinear(a*b) != bilinear(a)*bilinear(b)).
    """
    b, h, w, c = features.shape
    lead = coords.shape[:-1]
    coords = coords.reshape(b, -1, 2)

    hp, wp = h + 1, w + 1
    fp = jnp.pad(features, ((0, 0), (1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate(
        [fp[:, :-1, :-1], fp[:, :-1, 1:], fp[:, 1:, :-1], fp[:, 1:, 1:]],
        axis=-1,
    ).reshape(b, hp * wp, 4 * c)

    ix = _unnormalize(coords[..., 0], w)
    iy = _unnormalize(coords[..., 1], h)
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = (ix - ix0).astype(features.dtype)
    ty = (iy - iy0).astype(features.dtype)

    def inb(v, n):
        return ((v >= 0) & (v <= n - 1)).astype(features.dtype)

    mx0, mx1 = inb(ix0, w), inb(ix0 + 1, w)
    my0, my1 = inb(iy0, h), inb(iy0 + 1, h)
    xp = jnp.clip(ix0 + 1, 0, wp - 1).astype(jnp.int32)
    yp = jnp.clip(iy0 + 1, 0, hp - 1).astype(jnp.int32)

    rows = jnp.take_along_axis(quad, (yp * wp + xp)[..., None], axis=1)
    weights = jnp.stack(
        [
            (1 - tx) * (1 - ty) * mx0 * my0,
            tx * (1 - ty) * mx1 * my0,
            (1 - tx) * ty * mx0 * my1,
            tx * ty * mx1 * my1,
        ],
        axis=-1,
    )
    return (
        rows.reshape(lead + (4, c)),
        weights.reshape(lead + (4,)),
    )
