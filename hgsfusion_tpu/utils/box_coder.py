"""SECOND-style 7-dof residual box coder (jnp).

Reference: pcdet/utils/box_coder_utils.py:5-81 (ResidualCoder).
"""
from __future__ import annotations

import jax.numpy as jnp


class ResidualCoder:
    """Encode boxes as anchor residuals: center/diagonal, log-size, d-theta."""

    def __init__(self, code_size: int = 7, encode_angle_by_sincos: bool = False, **kwargs):
        self.code_size = code_size
        self.encode_angle_by_sincos = encode_angle_by_sincos
        if encode_angle_by_sincos:
            self.code_size += 1

    def encode(self, boxes, anchors):
        """(..., 7+C) gt boxes + anchors -> (..., code_size) targets.

        box_coder_utils.py:13-44 (dims clamped to 1e-5 before log).
        """
        anchors = jnp.concatenate(
            [anchors[..., :3], jnp.clip(anchors[..., 3:6], 1e-5, None), anchors[..., 6:]],
            axis=-1,
        )
        boxes = jnp.concatenate(
            [boxes[..., :3], jnp.clip(boxes[..., 3:6], 1e-5, None), boxes[..., 6:]],
            axis=-1,
        )
        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        xg, yg, zg, dxg, dyg, dzg, rg = [boxes[..., i] for i in range(7)]
        diagonal = jnp.sqrt(dxa**2 + dya**2)
        xt = (xg - xa) / diagonal
        yt = (yg - ya) / diagonal
        zt = (zg - za) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rts = [rg - ra]
        cts = [boxes[..., 7 + i] - anchors[..., 7 + i] for i in range(boxes.shape[-1] - 7)]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, *rts, *cts], axis=-1)

    def decode(self, box_encodings, anchors):
        """Inverse of encode. box_coder_utils.py:46-81."""
        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        if self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt = [box_encodings[..., i] for i in range(6)]
            cost, sint = box_encodings[..., 6], box_encodings[..., 7]
            n_extra = box_encodings.shape[-1] - 8
        else:
            xt, yt, zt, dxt, dyt, dzt, rt = [box_encodings[..., i] for i in range(7)]
            n_extra = box_encodings.shape[-1] - 7
        diagonal = jnp.sqrt(dxa**2 + dya**2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
            off = 8
        else:
            rg = rt + ra
            off = 7
        cgs = [box_encodings[..., off + i] + anchors[..., 7 + i] for i in range(n_extra)]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *cgs], axis=-1)


class PointResidualCoder:
    """Point-anchored 8-dof coder (PointRCNN-family point head).

    Reference: pcdet/utils/box_coder_utils.py:144-236 (PointResidualCoder):
    each point acts as an anchor positioned at itself with a per-class mean
    size; xy residuals are diagonal-normalized, z by the mean height, sizes
    log-ratio, and the heading is encoded as (cos, sin).
    """

    def __init__(self, mean_size, code_size: int = 8):
        self.code_size = code_size
        self.mean_size = jnp.asarray(mean_size, jnp.float32)  # (num_class, 3)

    def _anchor_dims(self, classes):
        """classes: (...,) 1-based class ids -> (..., 3) mean sizes."""
        idx = jnp.clip(classes - 1, 0, self.mean_size.shape[0] - 1)
        return self.mean_size[idx]

    def encode(self, gt_boxes, points, gt_classes):
        dims = jnp.clip(gt_boxes[..., 3:6], 1e-5, None)
        da = self._anchor_dims(gt_classes)
        diagonal = jnp.sqrt(da[..., 0] ** 2 + da[..., 1] ** 2)
        xt = (gt_boxes[..., 0] - points[..., 0]) / diagonal
        yt = (gt_boxes[..., 1] - points[..., 1]) / diagonal
        zt = (gt_boxes[..., 2] - points[..., 2]) / da[..., 2]
        dt = jnp.log(dims / da)
        rg = gt_boxes[..., 6]
        return jnp.concatenate(
            [jnp.stack([xt, yt, zt], -1), dt,
             jnp.stack([jnp.cos(rg), jnp.sin(rg)], -1)], axis=-1
        )

    def decode(self, encodings, points, pred_classes):
        da = self._anchor_dims(pred_classes)
        diagonal = jnp.sqrt(da[..., 0] ** 2 + da[..., 1] ** 2)
        xg = encodings[..., 0] * diagonal + points[..., 0]
        yg = encodings[..., 1] * diagonal + points[..., 1]
        zg = encodings[..., 2] * da[..., 2] + points[..., 2]
        dg = jnp.exp(encodings[..., 3:6]) * da
        rg = jnp.arctan2(encodings[..., 7], encodings[..., 6])
        return jnp.concatenate(
            [jnp.stack([xg, yg, zg], -1), dg, rg[..., None]], axis=-1
        )
