"""DSM spatial sync: radar occupancy gating of the image BEV + BEV collapse.

TPU-native equivalent of RadarOccupancy2DV2 + Conv2DCollapse
(pcdet/models/backbones_3d/vfe/radar_occupancy_2d_v2.py:9-399). Layout is
NHWC/BEV-major: voxel features (B, Y, X, Z, C), BEV maps (B, Y, X, C).
"""
from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import SEBlock, resize_bilinear


def bias_init_with_prob(prior_prob: float) -> float:
    """Focal-style bias init (radar_occupancy_2d_v2.py:120-123)."""
    return float(-np.log((1 - prior_prob) / prior_prob))


class Conv2DCollapse(nn.Module):
    """Voxel (B, Y, X, Z, C) -> BEV (B, Y, X, C_out) by Z-flatten + 1x1 reduce.

    radar_occupancy_2d_v2.Conv2DCollapse:53-84: flatten (B, C, Z, Y, X) ->
    (B, C*Z, Y, X) (channel-major over Z) then BasicBlock2D (conv 1x1 no-bias
    + BN + ReLU). We keep the c*Z + z channel ordering for checkpoint parity.
    """

    num_bev_features: int = 128
    use_bias: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, voxel, train: bool):
        b, y, x, z, c = voxel.shape
        # The torch flatten orders channels c*Z + z; the param keeps that
        # (C*Z, O) layout for checkpoint parity, but the contraction is done
        # directly on the (B, Y, X, Z, C) voxel — no 800 MB transpose+reshape
        # materialization (einsum contracts both axes in one MXU pass).
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (c * z, self.num_bev_features),
        )
        cdt = self.dtype or voxel.dtype
        k = kernel.reshape(c, z, self.num_bev_features).astype(cdt)
        out = jnp.einsum(
            "byxzc,czo->byxo", voxel.astype(cdt), k,
            preferred_element_type=jnp.float32,
        ).astype(cdt)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.num_bev_features,)
            )
            out = out + bias.astype(cdt)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(out)
        return nn.relu(out)


class RadarOccupancy2D(nn.Module):
    """Occupancy head over the radar BEV + multiplicative image-BEV gating.

    Serial-ASPP head (radar_occupancy_2d_v2.py:168-208, USE_ASPP with no
    ASPP_DIAL): 1x1 conv -> BN -> ReLU -> 3x3 dilated conv -> BN -> ReLU ->
    3x3 conv (C/2) -> BN -> ReLU -> 3x3 conv (1, bias focal-init) -> sigmoid.
    FUSE_MODE 'MUL' gates the image BEV (forward:312-317).
    """

    radar_input_channels: int = 128
    use_aspp: bool = True
    aspp_dilation: int = 6  # ASPP_SHAPE (6 VoD default, 3 TJ4D)
    # parallel-ASPP variant (ASPP_DIAL, radar_occupancy_2d_v2.py:210-268):
    # one branch per dilation (1 -> 1x1 conv, else 3x3 dilated), optionally
    # deformable (USE_DCN; mmcv ModulatedDeformConv2dPack -> our
    # ops/deform_conv.py), concat -> 1x1 fuse. None = serial ASPP (shipped).
    aspp_dilations: tuple | None = None
    use_dcn: tuple | None = None
    occupancy_init: float = 0.01
    fuse_mode: str = "MUL"
    # radial-Gaussian confidence blend (radar_occupancy_2d_v2.py:273-310,
    # USE_MASK; off in all shipped configs): gate = occ*ratio + (1-ratio)
    # with ratio = exp(-(x^2 + y_centered^2) / (2*240^2)) over the BEV grid,
    # so far-range cells trust the image BEV unmodified. The reference's
    # [-3]-indexed bias fill under this flag lands on a BatchNorm bias (a
    # latent indexing quirk) and is not replicated.
    use_mask: bool = False
    mask_sigma: float = 240.0
    dtype: object = None

    @nn.compact
    def __call__(self, image_bev, radar_bev, train: bool):
        """image_bev: (B, Yi, Xi, C); radar_bev: (B, Y, X, C).

        Returns (gated image BEV (B, Y, X, C), occupancy (B, Y, X, 1)).
        """
        if image_bev.shape[1:3] != radar_bev.shape[1:3]:
            image_bev = resize_bilinear(image_bev, radar_bev.shape[1:3])

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name,
            )

        c = self.radar_input_channels
        h = radar_bev
        if self.use_aspp and self.aspp_dilations is not None:
            # parallel ASPP (+ optional deformable branches)
            from ..ops.deform_conv import ModulatedDeformConv2d

            dcn_flags = self.use_dcn or (False,) * len(self.aspp_dilations)
            if len(dcn_flags) != len(self.aspp_dilations):
                raise ValueError(
                    f"USE_DCN has {len(dcn_flags)} entries for "
                    f"{len(self.aspp_dilations)} ASPP_DIAL branches "
                    "(the reference asserts equal lengths)"
                )
            branches = []
            for bi, (dial, dcn) in enumerate(
                    zip(self.aspp_dilations, dcn_flags)):
                if dcn:
                    hb = ModulatedDeformConv2d(
                        c, kernel_size=1 if dial == 1 else 3,
                        dilation=dial, dtype=self.dtype,
                        name=f"aspp_dcn{bi}",
                    )(h)
                else:
                    ks = 1 if dial == 1 else 3
                    pad = 0 if dial == 1 else dial
                    hb = nn.Conv(
                        c, (ks, ks), padding=((pad, pad), (pad, pad)),
                        kernel_dilation=(dial, dial), use_bias=False,
                        dtype=self.dtype, name=f"aspp_branch{bi}",
                    )(h)
                hb = nn.relu(bn(f"aspp_branch_bn{bi}")(hb))
                branches.append(hb)
            h = nn.Conv(
                c, (1, 1), use_bias=False, dtype=self.dtype,
                name="aspp_fuse",
            )(jnp.concatenate(branches, axis=-1))
            h = nn.relu(bn("aspp_fuse_bn")(h))
        elif self.use_aspp:
            h = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                        name="aspp_conv1")(h)
            h = nn.relu(bn("aspp_bn1")(h))
            d = self.aspp_dilation
            h = nn.Conv(
                c, (3, 3), padding=((d, d), (d, d)), kernel_dilation=(d, d),
                use_bias=False, dtype=self.dtype, name="aspp_conv2",
            )(h)
            h = nn.relu(bn("aspp_bn2")(h))
        h = nn.Conv(c // 2, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                    dtype=self.dtype, name="occ_conv1")(h)
        h = nn.relu(bn("occ_bn1")(h))
        h = nn.Conv(
            1, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
            bias_init=nn.initializers.constant(
                bias_init_with_prob(self.occupancy_init)
            ),
            name="occ_conv2",
        )(h)
        # occupancy probabilities in f32 (loss stability + gating precision)
        occupancy = nn.sigmoid(h.astype(jnp.float32))

        if self.use_mask:
            ny, nx = radar_bev.shape[1:3]
            ys = (jnp.arange(ny, dtype=jnp.float32) - ny // 2)[:, None]
            xs = jnp.arange(nx, dtype=jnp.float32)[None, :]
            ratio = jnp.exp(
                -(xs * xs + ys * ys) / (2.0 * self.mask_sigma ** 2)
            )[None, :, :, None]
            return image_bev * (occupancy * ratio + (1.0 - ratio)), occupancy

        if self.fuse_mode == "MUL":
            gated = image_bev * occupancy
        elif self.fuse_mode == "SE":
            fused = jnp.concatenate([image_bev * occupancy, image_bev], axis=-1)
            fused = SEBlock(2 * c, name="se")(fused)
            fused = nn.Conv(c, (1, 1), use_bias=True, name="se_squeeze_conv")(fused)
            fused = nn.relu(bn("se_squeeze_bn")(fused))
            gated = fused
        else:
            raise NotImplementedError(self.fuse_mode)
        return gated, occupancy


def rasterize_gt_boxes_bev(gt_boxes, grid_size, pc_range, voxel_size,
                           max_half_extent: int = 48):
    """Rasterize gt boxes to a binary BEV occupancy target (B, ny, nx).

    Vectorized equivalent of RadarOccupancy2DV2.get_loss:339-398: per box,
    with one static bound the reference's unbounded torch.arange does not
    have: a box's rasterized footprint is limited to +/-max_half_extent
    voxels per axis (default 48 = 15.3 m at the VoD 0.16 m voxel), so the
    ENDS of vehicles longer than 2*max_half_extent*voxel are not marked.
    Raise max_half_extent for datasets with larger classes + fine voxels.
    integer voxel offsets dx in [-d, d), dy in [-d, d) (d = floor(half-dim /
    voxel)) are rotated by the heading (x-toward-y), floored, shifted by the
    floored center voxel, clamped into the grid, and set to 1. The per-box
    dynamic arange becomes a static (2K)^2 offset grid with a per-box mask.
    """
    b, m, _ = gt_boxes.shape
    nx, ny = int(grid_size[0]), int(grid_size[1])
    k = max_half_extent
    vox = jnp.asarray(voxel_size[:2], jnp.float32)
    low = jnp.asarray(pc_range[:2], jnp.float32)

    center = jnp.floor((gt_boxes[..., 0:2] - low) / vox)  # (B, M, 2)
    halfdim = jnp.floor(gt_boxes[..., 3:5] / 2.0 / vox)  # (B, M, 2)
    heading = gt_boxes[..., 6]
    valid = gt_boxes[..., -1] > 0

    offs = jnp.arange(-k, k, dtype=jnp.float32)  # (2K,)
    dxg, dyg = jnp.meshgrid(offs, offs, indexing="ij")  # (2K, 2K)
    dxg = dxg.reshape(-1)
    dyg = dyg.reshape(-1)  # (P,)

    # per-box offset mask: arange(-d, d) membership
    in_x = (dxg[None, None] >= -halfdim[..., 0:1]) & (dxg[None, None] < halfdim[..., 0:1])
    in_y = (dyg[None, None] >= -halfdim[..., 1:2]) & (dyg[None, None] < halfdim[..., 1:2])
    osel = in_x & in_y & valid[..., None]  # (B, M, P)

    cosa = jnp.cos(heading)[..., None]
    sina = jnp.sin(heading)[..., None]
    rx = jnp.floor(dxg[None, None] * cosa - dyg[None, None] * sina)
    ry = jnp.floor(dxg[None, None] * sina + dyg[None, None] * cosa)
    px = jnp.clip(center[..., 0:1] + rx, 0, nx - 1).astype(jnp.int32)
    py = jnp.clip(center[..., 1:2] + ry, 0, ny - 1).astype(jnp.int32)
    flat = jnp.where(osel, py * nx + px, nx * ny)  # dump slot for masked

    def one(ids):
        tgt = jnp.zeros((nx * ny + 1,), jnp.float32).at[ids.reshape(-1)].set(1.0)
        return tgt[: nx * ny].reshape(ny, nx)

    return jax.vmap(one)(flat)


def binary_focal_loss(probs, labels, alpha: float = 0.25, gamma: float = 2.0,
                      eps: float = 1e-7):
    """Mean binary focal loss on probabilities (radar_occupancy_2d_v2.Focal_Loss:20-38)."""
    loss_pos = -alpha * jnp.power(1 - probs, gamma) * jnp.log(probs + eps) * labels
    loss_neg = -(1 - alpha) * jnp.power(probs, gamma) * jnp.log(1 - probs + eps) * (
        1 - labels
    )
    return jnp.mean(loss_pos + loss_neg)


def occupancy_loss(occupancy, gt_boxes, grid_size, pc_range, voxel_size,
                   max_half_extent: int = 32):
    """Focal loss of predicted occupancy vs rasterized gt (get_loss:339-398)."""
    target = rasterize_gt_boxes_bev(
        gt_boxes, grid_size, pc_range, voxel_size, max_half_extent
    )
    return binary_focal_loss(occupancy[..., 0], target)
