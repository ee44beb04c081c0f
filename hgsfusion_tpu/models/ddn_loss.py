"""DDN depth-distribution loss with foreground/background balancing.

Reference: pcdet/.../ffn/ddn_loss/ddn_loss.py:15-75 + balancer.py (kornia
FocalLoss over binned depth targets, fg/bg weights from 2D gt boxes, loss
normalized by total pixel count) and loss_utils.compute_fg_mask:237-262.
Inactive in the shipped HGS configs (USE_DEPTH False) but part of the
ImageVFE surface.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def bin_depth_target(depth_map, mode: str, depth_min: float, depth_max: float,
                     num_bins: int):
    """Integer depth-bin targets (transform_utils.bin_depths target=True):
    out-of-range / non-finite depths map to the overflow bin `num_bins`."""
    from .frustum import bin_depths

    idx = bin_depths(depth_map, mode, depth_min, depth_max, num_bins)
    bad = (idx < 0) | (idx > num_bins) | ~jnp.isfinite(idx)
    return jnp.where(bad, num_bins, idx).astype(jnp.int32)


def compute_fg_mask(gt_boxes2d, shape, downsample_factor: int = 1):
    """(B, N, 4) 2D boxes -> (B, H, W) bool foreground mask.

    Vectorized equivalent of compute_fg_mask:237-262 (floor mins, ceil maxs,
    half-open [v1, v2) x [u1, u2) fill). Zero-area (padded) boxes add nothing.
    """
    b, h, w = shape
    boxes = gt_boxes2d / downsample_factor
    u1 = jnp.floor(boxes[..., 0])
    v1 = jnp.floor(boxes[..., 1])
    u2 = jnp.ceil(boxes[..., 2])
    v2 = jnp.ceil(boxes[..., 3])
    us = jnp.arange(w, dtype=boxes.dtype)
    vs = jnp.arange(h, dtype=boxes.dtype)
    in_u = (us[None, None, :] >= u1[..., None]) & (us[None, None, :] < u2[..., None])
    in_v = (vs[None, None, :] >= v1[..., None]) & (vs[None, None, :] < v2[..., None])
    # (B, N, H, 1) & (B, N, 1, W) -> any over N
    return jnp.any(in_v[:, :, :, None] & in_u[:, :, None, :], axis=1)


def focal_ce(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """kornia-style multi-class focal loss, per pixel (reduction none).

    loss = -alpha * (1 - p_t)^gamma * log(p_t) with p_t the softmax
    probability of the target class.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    n_cls = logits.shape[-1]
    onehot = jax.nn.one_hot(targets, n_cls, dtype=logits.dtype)
    logpt = jnp.sum(onehot * logp, axis=-1)
    pt = jnp.exp(logpt)
    return -alpha * jnp.power(1.0 - pt, gamma) * logpt


def ddn_loss(depth_logits, depth_maps, gt_boxes2d, disc_cfg: Dict,
             weight: float = 3.0, alpha: float = 0.25, gamma: float = 2.0,
             fg_weight: float = 13.0, bg_weight: float = 1.0,
             downsample_factor: int = 1) -> Tuple[jnp.ndarray, Dict]:
    """depth_logits (B, H, W, D+1) NHWC, depth_maps (B, H, W), gt_boxes2d
    (B, N, 4). Returns (loss, tb_dict)."""
    target = bin_depth_target(depth_maps, **disc_cfg)
    pixel_loss = focal_ce(depth_logits, target, alpha=alpha, gamma=gamma)

    fg_mask = compute_fg_mask(gt_boxes2d, pixel_loss.shape, downsample_factor)
    fg = fg_mask.astype(pixel_loss.dtype)
    weights = fg_weight * fg + bg_weight * (1.0 - fg)
    num_pixels = pixel_loss.size
    weighted = pixel_loss * weights
    fg_loss = jnp.sum(weighted * fg) / num_pixels
    bg_loss = jnp.sum(weighted * (1.0 - fg)) / num_pixels
    total = (fg_loss + bg_loss) * weight
    return total, {"ddn_loss": total, "fg_loss": fg_loss, "bg_loss": bg_loss}
