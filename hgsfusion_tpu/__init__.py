"""hgsfusion_tpu: TPU-native (JAX/XLA/Pallas) radar-camera 3D detection framework.

A from-scratch rebuild of the capabilities of HGSFusion (AAAI 2025,
radar-camera fusion for 3D object detection on View-of-Delft / TJ4DRadSet),
designed TPU-first:

- pillar voxelization / scatter-max as XLA segment ops (Pallas variants for
  the hot path) instead of CUDA kernels,
- the "sparse" BEV encoder as dense MXU convolutions with active-site-masked
  batch norm (numerically equivalent to submanifold sparse conv on these
  small BEV grids),
- rotated IoU / NMS fully on-device (fixed-shape convex polygon clipping +
  masked greedy sweep) so the frame->detections path never leaves the TPU,
- data parallelism via jax.sharding.Mesh + jit'ed collectives (not NCCL).

Reference behavior is documented per-module with `/root/reference` file:line
citations so parity can be audited.
"""

__version__ = "0.1.0"
