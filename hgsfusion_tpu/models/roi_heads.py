"""Second-stage RoI heads: SECOND-IoU BEV grid head + Voxel-RCNN grid pool.

Behavior references (not copied):
  pcdet/models/roi_heads/second_head.py (SECONDHead: rotated affine
    grid_sample of the stride-8 BEV features over a GRID_SIZE^2 RoI grid,
    shared FCs, single IoU logit; align_corners=True),
  pcdet/models/detectors/second_net_iou.py (post-processing score
    rectification: SCORE_TYPE 'iou' / 'weighted_iou_cls'),
  pcdet/models/roi_heads/voxelrcnn_head.py (voxel neighbor aggregation of
    the 3D backbone stages x_conv2/3/4 at 6^3 RoI grid points, shared FC,
    cls + reg branches).

TPU-first: the rotated grid sample is expressed in closed form (the affine
theta of second_head.py:92-116 reduces to grid points on the rotated box
with align_corners endpoints — derived below) and evaluated as a batched
bilinear gather; Voxel-RCNN's voxel-query neighbor aggregation runs as ball
query over dense voxel-center point sets with validity masks (same
treatment as PV-RCNN's VSA; documented deviation from the Manhattan-metric
voxel query — the neighborhoods are equal up to the corner cells of the
query cube).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .pvrcnn import SALayer, _stage_point_set, roi_grid_points


def bilinear_sample_pixel(feat, px, py):
    """Bilinear sample (H, W, C) at pixel coords (N,) px/py (align_corners
    convention: integer coords hit texel centers; zeros outside)."""
    h, w, c = feat.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    tx = (px - x0)[:, None]
    ty = (py - y0)[:, None]

    def tap(xi, yi):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        g = feat.reshape(h * w, c)[yc * w + xc]
        return g * inb[:, None].astype(g.dtype)

    return (
        tap(x0, y0) * (1 - tx) * (1 - ty)
        + tap(x0 + 1, y0) * tx * (1 - ty)
        + tap(x0, y0 + 1) * (1 - tx) * ty
        + tap(x0 + 1, y0 + 1) * tx * ty
    )


def rotated_bev_grid_pool(feats2d, rois, pc_range, voxel_size,
                          down_ratio: int, grid_size: int):
    """SECONDHead.roi_grid_pool as closed-form rotated grid sampling.

    The reference builds an affine theta mapping output-normalized coords to
    input-normalized coords and calls F.affine_grid + F.grid_sample with
    align_corners=True (second_head.py:64-120). Substituting the
    align_corners pixel mapping px = (xn + 1) / 2 * (W - 1) collapses the
    composition to

        px = cx + (hw_x) * (cos r * xn - sin r * yn)
        py = cy + (hw_y) * (sin r * xn + cos r * yn)

    with (cx, cy) the box center and (hw_x, hw_y) its half extents in
    feature pixels, xn/yn in linspace(-1, 1, G) — i.e. a G x G grid spanning
    the rotated box with endpoints ON the box edges. Exact, no resampling.

    feats2d (B, H, W, C); rois (B, R, 7). Returns (B, R, G*G, C).
    """
    g = grid_size
    lin = jnp.linspace(-1.0, 1.0, g)
    yn, xn = jnp.meshgrid(lin, lin, indexing="ij")  # (g, g)
    xn = xn.reshape(-1)
    yn = yn.reshape(-1)

    def one_frame(feat, boxes):
        cx = (boxes[:, 0] - pc_range[0]) / (voxel_size[0] * down_ratio)
        cy = (boxes[:, 1] - pc_range[1]) / (voxel_size[1] * down_ratio)
        hx = boxes[:, 3] / 2.0 / (voxel_size[0] * down_ratio)
        hy = boxes[:, 4] / 2.0 / (voxel_size[1] * down_ratio)
        # NOTE: the reference maps the metric center to pixel (c - min)/cell
        # with NO half-texel offset (second_head.py:92-99) — a systematic
        # +0.5-pixel bias kept here verbatim for checkpoint parity.
        cr = jnp.cos(boxes[:, 6])
        sr = jnp.sin(boxes[:, 6])
        px = cx[:, None] + hx[:, None] * (cr[:, None] * xn - sr[:, None] * yn)
        py = cy[:, None] + hy[:, None] * (sr[:, None] * xn + cr[:, None] * yn)
        r = boxes.shape[0]
        out = bilinear_sample_pixel(feat, px.reshape(-1), py.reshape(-1))
        return out.reshape(r, g * g, -1)

    return jax.vmap(one_frame)(feats2d, rois)


class SECONDIoUHead(nn.Module):
    """Shared FCs over the flattened BEV RoI grid -> single IoU logit.

    second_head.py:17-35 (SHARED_FC [256, 256], IOU_FC [256, 256], DP 0.3
    between shared FCs — dropout omitted, documented: the head is tiny and
    the reference disables it at eval anyway).
    """

    shared_fc: Tuple[int, ...] = (256, 256)
    iou_fc: Tuple[int, ...] = (256, 256)
    dtype: object = None

    @nn.compact
    def __call__(self, pooled, train: bool):
        b, r = pooled.shape[:2]
        h = pooled.reshape(b, r, -1)
        for i, c in enumerate(self.shared_fc):
            h = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"shared_fc{i}")(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"shared_bn{i}",
            )(h)
            h = nn.relu(h)
        for i, c in enumerate(self.iou_fc):
            h = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"iou_fc{i}")(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"iou_bn{i}",
            )(h)
            h = nn.relu(h)
        iou = nn.Dense(1, dtype=self.dtype, name="iou_pred")(h)
        return iou[..., 0].astype(jnp.float32)  # (B, R)


def iou_head_loss(iou_logits, targets: Dict):
    """BCE between sigmoid(iou logit) and the clipped roi-IoU soft label
    (roi_head_template.get_box_cls_layer_loss with BinaryCrossEntropy)."""
    cls_t = targets["cls_labels"]
    cv = targets["cls_valid"].astype(jnp.float32)
    p = jnp.clip(jax.nn.sigmoid(iou_logits), 1e-6, 1 - 1e-6)
    bce = -(cls_t * jnp.log(p) + (1 - cls_t) * jnp.log(1 - p))
    return jnp.sum(bce * cv) / jnp.maximum(jnp.sum(cv), 1.0)


def rectified_scores(cls_scores, iou_scores, score_type: str = "iou",
                     iou_weight: float = 0.7):
    """second_net_iou.py post-processing NMS score selection: 'iou' uses the
    predicted IoU alone; 'weighted_iou_cls' blends w*iou + (1-w)*cls."""
    if score_type == "iou":
        return iou_scores
    if score_type == "weighted_iou_cls":
        return iou_weight * iou_scores + (1.0 - iou_weight) * cls_scores
    if score_type == "cls":
        return cls_scores
    raise ValueError(f"unknown SCORE_TYPE {score_type}")


class VoxelRCNNPool(nn.Module):
    """Aggregate 3D-backbone stage features at 6^3 RoI grid points.

    voxelrcnn_head.py roi_grid_pool:106-192: for each feature source
    (x_conv2/3/4) a voxel-query neighborhood around every grid point is
    MLP'd and max-pooled; sources concatenate channel-wise. Here each stage
    becomes a voxel-center point set (masked) and the neighborhood is a ball
    query of radius `radius_scale x stage voxel diagonal` — covers the same
    3x3x3 voxel cube the reference queries (documented metric deviation).
    """

    grid_size: int = 6
    radius_scale: float = 1.8
    nsample: int = 16
    mlps: Tuple[int, ...] = (32, 32)
    pc_range: Tuple[float, ...] = (0.0, -25.6, -3.0, 51.2, 25.6, 2.0)
    voxel_size: Tuple[float, ...] = (0.16, 0.16, 0.16)
    dtype: object = None

    @nn.compact
    def __call__(self, rois, stages: Dict, train: bool):
        b, r = rois.shape[:2]
        grid = jax.vmap(lambda ro: roi_grid_points(ro, self.grid_size))(rois)
        grid = grid.reshape(b, r * self.grid_size ** 3, 3)
        outs = []
        for name in ("x_conv2", "x_conv3", "x_conv4"):
            feats, mask, ds = stages[name]
            centers, sf, sv = _stage_point_set(
                stages[name], self.pc_range, self.voxel_size
            )
            ctr = jnp.broadcast_to(centers[None], (b,) + centers.shape)
            radius = self.radius_scale * ds * max(
                self.voxel_size[0], self.voxel_size[1], self.voxel_size[2]
            )
            pooled = SALayer(
                radii=(radius,), nsamples=(self.nsample,), mlps=(self.mlps,),
                dtype=self.dtype, name=f"pool_{name}",
            )(grid, ctr, sf, sv, train)
            outs.append(pooled)
        out = jnp.concatenate(outs, axis=-1)
        return out.reshape(b, r, self.grid_size ** 3, -1)
