"""Point-in-rotated-box tests (jnp / numpy).

Replaces pcdet/ops/roiaware_pool3d (points_in_boxes_cpu/gpu,
src/roiaware_pool3d_kernel.cu:313) used by gt-database creation and
augmentation: a rotated box containment test is plain vector math.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def points_in_boxes(points, boxes):
    """points (N, 3), boxes (M, 7) -> (M, N) bool containment.

    Matches the reference check_pt_in_box3d: local z within [-dz/2, dz/2],
    |local x| < dx/2, |local y| < dy/2 after rotating by -heading.
    """
    xp = np if isinstance(points, np.ndarray) else jnp
    shift = points[None, :, 0:3] - boxes[:, None, 0:3]  # (M, N, 3)
    cosa = xp.cos(-boxes[:, 6])[:, None]
    sina = xp.sin(-boxes[:, 6])[:, None]
    local_x = shift[..., 0] * cosa - shift[..., 1] * sina
    local_y = shift[..., 0] * sina + shift[..., 1] * cosa
    in_x = xp.abs(local_x) < boxes[:, None, 3] / 2
    in_y = xp.abs(local_y) < boxes[:, None, 4] / 2
    in_z = xp.abs(shift[..., 2]) <= boxes[:, None, 5] / 2
    return in_x & in_y & in_z
