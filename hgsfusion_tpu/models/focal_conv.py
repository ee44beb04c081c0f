"""Focal sparse convolution family, dense-masked (TPU-native).

Equivalents of the reference's focals-conv modules:
- FocalSparseConv3D: focal_sparse_conv/focal_sparse_conv.py:9-224 +
  focal_sparse_utils.py split_voxels/check_repeat — a submanifold conv whose
  active set is DILATED at predicted-important voxels: a 27-channel
  importance head scores the voxel itself (last channel) and each of its 26
  neighbors; voxels above the threshold (or in the top ratio) spawn their
  selected neighbors as new active sites before the main conv runs.
- VoxelBackBone8xFocal: spconv_backbone_focal.py:101-269 — VoxelBackBone8x
  with a focal conv closing stages 1-3; its auxiliary focal loss supervises
  the voxel-importance sigmoid against inside-gt-box occupancy.

Dense-masked mapping: the sparse tensor is (B, D, H, W, C) + active mask;
split/dilate/dedup becomes 26 static shifted adds. check_repeat's
duplicate handling is reproduced exactly: coincident entries SUM features
(new sites carry zero features, so originals survive) and AVERAGE the
kernel-importance multiplier (sum of landed importances + 1 for an
original foreground site, divided by the landing count). The reference's
boundary quirk — dilation targets require index > 0, strictly, on every
axis (focal_sparse_utils.py:130-131) — is kept.

Documented deviation: the reference's check_repeat builds its dedup key
with strides taken from the max coordinate VALUES present
(focal_sparse_utils.py:48,71), so distinct coordinates such as (z, y+1, 0)
and (z, y, x_max) hash equal and get silently merged — a data-dependent
lossy artifact, not a modeling choice. The dense-masked form is inherently
collision-free and does not drop those voxels.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .voxel_backbone import (
    MaskedBatchNorm,
    _SparseDown3D,
    _SubMConvBN3D,
)


def _kernel_offsets(k: int = 3):
    """(k^3 - 1, 3) neighbor offsets in (dz, dy, dx), z-major, center
    removed — the conv_imp channel order (focal_sparse_conv.py:42-44)."""
    step = k // 2
    offs = [
        (i, j, l)
        for i in range(-step, step + 1)
        for j in range(-step, step + 1)
        for l in range(-step, step + 1)
    ]
    offs.remove((0, 0, 0))
    return offs


def _shift(v, off):
    """shifted[t] = v[t - off] with zero fill (dilation scatter as a
    static slice of a padded volume); v is (B, D, H, W, C)."""
    dz, dy, dx = off
    d, h, w = v.shape[1:4]
    p = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    return p[:, 1 - dz:1 - dz + d, 1 - dy:1 - dy + h, 1 - dx:1 - dx + w]


class FocalSparseConv3D(nn.Module):
    """Dense-masked FocalSparseConv (lidar-only path, use_img False).

    Returns (features, new_mask, aux) where aux carries the voxel
    importance sigmoid + the input active mask for the focal loss.
    """

    features: int
    voxel_stride: int = 1
    kernel_size: int = 3
    threshold: float = 0.5
    topk: bool = True  # True: top-(threshold*N) per sample; False: > thresh
    mask_multi: bool = False
    skip_mask_kernel: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        k = self.kernel_size
        offs = _kernel_offsets(k)
        m = mask.astype(x.dtype)

        # importance head: submanifold conv -> k^3 channels, last = voxel
        imps = nn.Conv(
            k ** 3, kernel_size=(3, 3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv_imp",
        )(x * m) * m
        imps = jax.nn.sigmoid(imps.astype(jnp.float32))
        mask_voxel = imps[..., -1:]  # (B, D, H, W, 1)
        active = mask[..., 0] if mask.ndim == 5 else mask

        mv = jnp.where(active, mask_voxel[..., 0], 0.0)
        if self.topk:
            # per-sample top-(ratio * N_active): rank threshold from the
            # sorted scores (split_voxels topk branch); static shapes — the
            # k-th value is a dynamic gather into the sorted array
            b = mv.shape[0]
            flat = mv.reshape(b, -1)
            act_flat = active.reshape(b, -1)
            counts = jnp.sum(act_flat, axis=1)
            kth_idx = jnp.clip(
                (counts * self.threshold).astype(jnp.int32) - 1, 0, None)
            sorted_desc = -jnp.sort(-jnp.where(act_flat, flat, -1.0), axis=1)
            kth_val = jnp.take_along_axis(
                sorted_desc, kth_idx[:, None], axis=1)
            n_fore = (counts * self.threshold).astype(jnp.int32)
            fore_flat = act_flat & (flat >= kth_val) & (n_fore[:, None] > 0)
            fore = fore_flat.reshape(active.shape)
        else:
            fore = active & (mask_voxel[..., 0] > self.threshold)

        feats = x * m
        if self.mask_multi:
            feats = feats * mask_voxel.astype(feats.dtype)

        # dilation: each foreground voxel spawns its selected neighbors;
        # duplicates sum features (zero for new sites) and average the
        # kernel multiplier (check_repeat with features_add). The reference
        # drops dilation targets with index 0 on ANY axis (strict > 0,
        # focal_sparse_utils.py:130-131) — the interior mask reproduces it.
        d_, h_, w_ = active.shape[1:4]
        interior = np.ones((1, d_, h_, w_, 1), np.float32)
        interior[:, 0] = 0.0
        interior[:, :, 0] = 0.0
        interior[:, :, :, 0] = 0.0
        interior = jnp.asarray(interior)

        fore_f = fore[..., None].astype(jnp.float32)
        land_sum = fore_f  # original fore entries contribute weight 1
        land_cnt = fore_f
        dilated = jnp.zeros_like(fore)
        for j, off in enumerate(offs):
            imp_j = imps[..., j:j + 1]
            sel = fore_f * (imp_j >= self.threshold)
            landed = _shift(sel, off) * interior
            land_sum = land_sum + _shift(sel * imp_j, off) * interior
            land_cnt = land_cnt + landed
            dilated = dilated | (landed[..., 0] > 0)
        # safe denominator: 0/0 inside an untaken where-branch still makes
        # NaN gradients (jnp.where grad pitfall), so clamp before dividing
        kernel_avg = jnp.where(
            land_cnt > 0, land_sum / jnp.maximum(land_cnt, 1.0), 1.0)

        if not self.skip_mask_kernel:
            feats = jnp.where(fore[..., None], feats * kernel_avg.astype(
                feats.dtype), feats)
        new_active = active | dilated
        new_mask = new_active[..., None]

        y = nn.Conv(
            self.features, kernel_size=(k, k, k), padding=k // 2,
            use_bias=False, dtype=self.dtype, name="conv",
        )(feats) * new_mask.astype(feats.dtype)
        y = MaskedBatchNorm(
            self.features, eps=1e-3, momentum=0.01, name="bn1",
        )(y, new_mask, use_running_average=not train)
        y = nn.relu(y) * new_mask.astype(y.dtype)
        aux = {"mask_voxel": mv, "active": active,
               "voxel_stride": self.voxel_stride}
        return y, new_mask, aux


def focal_conv_loss(aux_list, gt_boxes, pc_range, voxel_size):
    """Auxiliary focal loss over voxel-importance sigmoids.

    focal_sparse_conv.py:135-142 + focal_sparse_utils.FocalLoss:7-36 —
    target = voxel coordinate inside any gt box; input probabilities
    [1-mv, mv] go through ANOTHER softmax (the reference quirk), clamp,
    CE x (1-p)^gamma, mean over the 2N active elements. Voxel coords are
    the cell CORNER (spatial_index * voxel_size + pc_min, no +0.5 — also
    the reference's convention).
    """
    from ..ops.points_in_boxes import points_in_boxes

    gamma, eps = 2.0, 1e-7
    total = 0.0
    for aux in aux_list:
        mv, active = aux["mask_voxel"], aux["active"]
        stride = aux["voxel_stride"]
        b, d, h, w = active.shape
        zs = jnp.arange(d) * stride * voxel_size[2] + pc_range[2]
        ys = jnp.arange(h) * stride * voxel_size[1] + pc_range[1]
        xs = jnp.arange(w) * stride * voxel_size[0] + pc_range[0]
        zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")
        pts = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)

        def one(gt_b):
            inside = points_in_boxes(pts, gt_b[:, :7])  # (M, N) containment
            # padded gt rows are all-zero; mask them out by a real-box
            # indicator (degenerate zero boxes contain nothing but guard
            # against boundary-inclusive z)
            real = gt_b[:, 3] > 0
            return jnp.any(inside & real[:, None], axis=0)

        tgt = jax.vmap(one)(gt_boxes).reshape(b, d, h, w)
        probs = jnp.stack([1.0 - mv, mv], axis=-1)
        logit = jax.nn.softmax(probs, axis=-1)
        logit = jnp.clip(logit, eps, 1.0 - eps)
        y = jnp.stack(
            [1.0 - tgt.astype(jnp.float32), tgt.astype(jnp.float32)],
            axis=-1)
        ce = -y * jnp.log(logit) * (1.0 - logit) ** gamma
        n = jnp.clip(jnp.sum(active), 1, None)
        total = total + jnp.sum(
            ce * active[..., None]) / (2.0 * n)
    return total


class VoxelBackBone8xFocal(nn.Module):
    """VoxelBackBone8x with focal convs closing stages 1-3
    (spconv_backbone_focal.py:155-199; lidar-only, USE_IMG False).

    Returns (out, mask, stages, aux_list); aux_list feeds focal_conv_loss.
    """

    topk: bool = True
    threshold: float = 0.5
    mask_multi: bool = False
    skip_mask_kernel: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        if x.shape[1] < 25:
            raise ValueError(
                f"VoxelBackBone8xFocal needs >= 25 z-planes (got {x.shape[1]})"
            )
        aux_list = []

        def focal(feats, m, ch, stride, name):
            y, m2, aux = FocalSparseConv3D(
                ch, voxel_stride=stride, topk=self.topk,
                threshold=self.threshold, mask_multi=self.mask_multi,
                skip_mask_kernel=self.skip_mask_kernel, dtype=self.dtype,
                name=name,
            )(feats, m, train)
            aux_list.append(aux)
            return y, m2

        x = _SubMConvBN3D(16, dtype=self.dtype, name="conv_input")(
            x, mask, train)
        x = _SubMConvBN3D(16, dtype=self.dtype, name="conv1")(x, mask, train)
        x, mask = focal(x, mask, 16, 1, "focal1")

        stages = {"x_conv1": (x, mask, 1)}
        x, mask = _SparseDown3D(32, dtype=self.dtype, name="conv2_down")(
            x, mask, train)
        x = _SubMConvBN3D(32, dtype=self.dtype, name="conv2_a")(x, mask, train)
        x = _SubMConvBN3D(32, dtype=self.dtype, name="conv2_b")(x, mask, train)
        x, mask = focal(x, mask, 32, 2, "focal2")
        stages["x_conv2"] = (x, mask, 2)

        x, mask = _SparseDown3D(64, dtype=self.dtype, name="conv3_down")(
            x, mask, train)
        x = _SubMConvBN3D(64, dtype=self.dtype, name="conv3_a")(x, mask, train)
        x = _SubMConvBN3D(64, dtype=self.dtype, name="conv3_b")(x, mask, train)
        x, mask = focal(x, mask, 64, 4, "focal3")
        stages["x_conv3"] = (x, mask, 4)

        x, mask = _SparseDown3D(
            64, padding=(0, 1, 1), dtype=self.dtype, name="conv4_down"
        )(x, mask, train)
        x = _SubMConvBN3D(64, dtype=self.dtype, name="conv4_a")(x, mask, train)
        x = _SubMConvBN3D(64, dtype=self.dtype, name="conv4_b")(x, mask, train)
        stages["x_conv4"] = (x, mask, 8)

        x, mask = _SparseDown3D(
            128, kernel=(3, 1, 1), stride=(2, 1, 1), padding=(0, 0, 0),
            dtype=self.dtype, name="conv_out",
        )(x, mask, train)
        return x, mask, stages, aux_list
