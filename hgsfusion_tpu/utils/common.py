"""Shared geometry / misc helpers (jnp + numpy twins).

Reference semantics: pcdet/utils/common_utils.py (limit_period:21,
rotate_points_along_z:35) in /root/reference.
"""
from __future__ import annotations

import logging
import sys

import jax.numpy as jnp
import numpy as np


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """Wrap angles into [-offset*period, (1-offset)*period).

    Matches common_utils.limit_period:21-24: val - floor(val/period + offset)*period.
    Works on jnp or numpy arrays (numpy in, numpy out).
    """
    if isinstance(val, np.ndarray) or np.isscalar(val):
        return val - np.floor(val / period + offset) * period
    return val - jnp.floor(val / period + offset) * period


def rotation_matrix_z(angle):
    """(..., 3, 3) rotation matrices for right-multiplication of row vectors.

    Matches common_utils.rotate_points_along_z:35-58 convention:
    points_rot = points @ R with R = [[cos, sin, 0], [-sin, cos, 0], [0, 0, 1]].
    """
    xp = np if isinstance(angle, np.ndarray) or np.isscalar(angle) else jnp
    angle = xp.asarray(angle)
    cosa = xp.cos(angle)
    sina = xp.sin(angle)
    zeros = xp.zeros_like(cosa)
    ones = xp.ones_like(cosa)
    rot = xp.stack(
        [cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones], axis=-1
    )
    return rot.reshape(*angle.shape, 3, 3)


def rotate_points_along_z(points, angle):
    """Rotate (B, N, 3+C) points by (B,) angles about +z (x toward y).

    Matches common_utils.rotate_points_along_z:35-58 (row-vector matmul).
    """
    xp = np if isinstance(points, np.ndarray) else jnp
    rot = rotation_matrix_z(angle)
    xyz = xp.matmul(points[..., 0:3], rot.astype(points.dtype))
    return xp.concatenate([xyz, points[..., 3:]], axis=-1)


def create_logger(log_file=None, rank: int = 0, level=logging.INFO):
    """Console (+optional file) logger; non-rank-0 processes log warnings only.

    Mirrors common_utils.create_logger:103-117.
    """
    logger = logging.getLogger("hgsfusion_tpu")
    logger.setLevel(level if rank == 0 else logging.WARNING)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    console = logging.StreamHandler(sys.stdout)
    console.setFormatter(fmt)
    logger.addHandler(console)
    if log_file is not None and rank == 0:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


class AverageMeter:
    """Running average tracker (common_utils.py:280-296)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
