"""DSM modality sync: SE fusion of image and radar BEV features.

TPU-native equivalent of FusionAfterBEVSEDirect
(pcdet/models/fusion/fusion_after_bev_se_direct.py:17-59).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import SEBlock, resize_bilinear


class FusionAfterBEVSE(nn.Module):
    """concat(image, radar) -> 3x3 conv + BN + ReLU -> SE block.

    Output channels = image_out + radar_out (256 in shipped configs). The
    image BEV is bilinearly resized (align_corners=False) to the radar BEV
    resolution when they differ (forward:51-52).
    """

    image_out_channels: int = 128
    radar_out_channels: int = 128
    dtype: object = None

    @nn.compact
    def __call__(self, image_bev, radar_bev, train: bool):
        if image_bev.shape[1:3] != radar_bev.shape[1:3]:
            image_bev = resize_bilinear(image_bev, radar_bev.shape[1:3])
        c = self.image_out_channels + self.radar_out_channels
        x = jnp.concatenate(
            [image_bev.astype(radar_bev.dtype), radar_bev], axis=-1
        )
        x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                    dtype=self.dtype, name="fuse_conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="fuse_bn",
        )(x)
        x = nn.relu(x)
        return SEBlock(c, name="se")(x)


def fusion_map_to_bev(image_bev, radar_bev):
    """Concat image BEV + radar BEV into one spatial_features map.

    TPU-native equivalent of Fusion_MAP_TO_BEV (map_to_bev/
    fusion_caddn_pp.py:5-31), a registered-but-unused leftover: the radar
    BEV (a PointPillar scatter or PillarNet's pre-scattered features) is
    bilinearly resized to the image BEV resolution when the grids differ,
    then channel-concatenated. Pure plumbing — no parameters, so a plain
    function rather than a module.

    image_bev: (B, Hi, Wi, Ci); radar_bev: (B, Hr, Wr, Cr).
    Returns (B, Hi, Wi, Ci + Cr).
    """
    if radar_bev.shape[1:3] != image_bev.shape[1:3]:
        radar_bev = resize_bilinear(radar_bev, image_bev.shape[1:3])
    return jnp.concatenate([image_bev, radar_bev], axis=-1)


class HeightCompressionMultiScale(nn.Module):
    """Per-scale Z-collapse of a 3D voxel pyramid to a list of BEV maps.

    TPU-native equivalent of HeightCompressionMultiScale (map_to_bev/
    height_compression_multi_scale.py:4-44), a registered-but-unused
    leftover: each scale's dense (B, Y, X, Z, C) volume is flattened over
    (Z, C) and reduced by a 1x1 conv + BN + ReLU — exactly Conv2DCollapse
    (occupancy.py) per scale, which this delegates to (incl. its torch
    c*Z + z kernel-flatten order for checkpoint parity).
    """

    out_channels: tuple = (128, 128, 128)
    dtype: object = None

    @nn.compact
    def __call__(self, voxel_pyramid, train: bool):
        """voxel_pyramid: sequence of (B, Y, X, Z, C) volumes (x_conv3,
        x_conv4, encoded tensor). Returns a list of (B, Y, X, O) maps."""
        from .occupancy import Conv2DCollapse

        return [
            Conv2DCollapse(
                num_bev_features=self.out_channels[i], use_bias=True,
                dtype=self.dtype, name=f"down{i}",
            )(vol, train)
            for i, vol in enumerate(voxel_pyramid)
        ]
