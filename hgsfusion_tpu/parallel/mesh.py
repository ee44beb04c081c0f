"""Device mesh + sharding helpers for data-parallel training.

TPU-native replacement for the reference's DDP/NCCL stack
(tools/train.py:160-162, utils/common_utils.py:162-204): a 1-D `data` mesh
with replicated params and batch-sharded inputs. Gradient all-reduce,
metric averaging, and BN cross-device statistics all become XLA collectives
inserted automatically by jit over global arrays (i.e. SyncBN semantics come
for free, vs the reference's opt-in convert_sync_batchnorm).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def make_mesh_2d(n_data: int, n_spatial: int,
                 axis_names=("data", "spatial")) -> Mesh:
    """(data x spatial) hybrid mesh for dp + spatial partitioning.

    Detection CNNs have no tensor-parallel weight axis worth sharding
    (largest layer is a 3x3 conv over <=256 channels), so the natural
    second mesh axis is SPATIAL: GSPMD partitions image rows / BEV rows
    across it, inserting halo exchanges for convolutions automatically.
    Lay the spatial axis innermost so its collectives ride neighboring
    ICI links and the data-parallel gradient all-reduce crosses the
    outer axis once per step.
    """
    devices = jax.devices()[: n_data * n_spatial]
    if len(devices) < n_data * n_spatial:
        raise ValueError(
            f"need {n_data * n_spatial} devices, have {len(devices)}")
    return Mesh(
        np.array(devices).reshape(n_data, n_spatial), tuple(axis_names))


def spatial_batch_sharding(mesh: Mesh, ndim: int,
                           axes=("data", "spatial")) -> NamedSharding:
    """Shard dim 0 (batch) over `data` and dim 1 (H / rows) over `spatial`;
    arrays with fewer than 2 dims fall back to data-only sharding."""
    if ndim >= 2:
        return NamedSharding(mesh, P(axes[0], axes[1]))
    return NamedSharding(mesh, P(axes[0]))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """device_put each array leaf with its batch dim sharded over the mesh."""
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return x

    return {
        k: put(v) if not isinstance(v, list) else v for k, v in batch.items()
    }
