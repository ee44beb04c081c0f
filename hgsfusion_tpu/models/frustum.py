"""Image -> BEV frustum view transform (multi-scale grid sampling).

TPU-native equivalent of FrustumGridGenerator + FrustumToVoxelMultiScale
(pcdet/.../f2v/frustum_grid_generator.py:41-180,
frustum_to_voxel_multi_scale.py:8-109, sampler.py:8-37).

Geometry (transform_grid:106-145): voxel-center grid (ix+.5, iy+.5, iz+.5)
-> lidar via the diag(voxel) + pc_min unprojection -> optional inverse BEV
augmentation matrix -> camera -> pinhole projection to (u, v) + depth; depth
binned with LID/UD/SID (transform_utils.bin_depths:63-96); all three coords
normalized to [-1, 1] against (W_img-1, H_img-1, D-1) (normalize_coords:
44-60); non-finite -> -2 (out of bounds).

With USE_DEPTH False the reference samples a D=1 volume, where
align_corners=True collapses ANY depth coordinate to plane 0 — the depth
coordinate is dead and the transform reduces to per-voxel 2-D bilinear
sampling of (u, v) (verified against torch in tests/test_ops.py). We sample
2-D directly and fuse concat + 1x1x1 reduce as a Dense over the
concatenated-scale channel axis.
"""
from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def bin_depths(depth, mode: str, depth_min: float, depth_max: float, num_bins: int):
    """Continuous depth-bin index (transform_utils.bin_depths:63-96, target=False)."""
    if mode == "UD":
        bin_size = (depth_max - depth_min) / num_bins
        return (depth - depth_min) / bin_size
    if mode == "LID":
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        return -0.5 + 0.5 * jnp.sqrt(1 + 8 * (depth - depth_min) / bin_size)
    if mode == "SID":
        return (
            num_bins
            * (jnp.log(1 + depth) - math.log(1 + depth_min))
            / (math.log(1 + depth_max) - math.log(1 + depth_min))
        )
    raise NotImplementedError(mode)


def pseudocost_from_depth(depth_map, mode: str, depth_min: float,
                          depth_max: float, num_bins: int,
                          magnitude: float = 10.0):
    """One-hot pseudo depth logits from a dense depth map.

    DepthFFN_mapping.pseudocost_from_mono (depth_ffn_mapping.py:104-133,
    USE_LIDAR_DEPTH): discretize each pixel's depth (UD/LID/SID), truncate
    toward zero (torch .type(int64)), send out-of-range/non-finite pixels
    to the overflow bin, and scatter magnitude-10 spikes — a hard
    replacement for the DDN's softmax logits.

    depth_map: (B, H, W) -> (B, H, W, num_bins + 1).
    """
    idx = bin_depths(depth_map, mode, depth_min, depth_max, num_bins)
    bad = (idx < 0) | (idx > num_bins) | ~jnp.isfinite(idx)
    idx = jnp.where(bad, num_bins, idx.astype(jnp.int32))
    idx = jnp.clip(idx.astype(jnp.int32), 0, num_bins)
    return jax.nn.one_hot(idx, num_bins + 1, dtype=jnp.float32) * magnitude


class FrustumGridGenerator:
    """Builds the (B, Y, X, Z, 3) normalized frustum sampling grid.

    Output layout is (y, x, z) spatial order with last dim (u, v, depth_bin)
    in [-1, 1] — same data as the reference's (B, X, Y, Z, 3) grid, laid out
    to produce BEV-major tensors directly.
    """

    def __init__(self, grid_size, pc_range, disc_cfg, bev_aug: bool = False):
        self.nx, self.ny, self.nz = (int(g) for g in grid_size)
        self.pc_min = jnp.asarray(pc_range[:3], jnp.float32)
        pc_max = jnp.asarray(pc_range[3:], jnp.float32)
        self.voxel_size = (pc_max - self.pc_min) / jnp.asarray(
            [self.nx, self.ny, self.nz], jnp.float32
        )
        self.disc_cfg = dict(disc_cfg)
        self.bev_aug = bev_aug
        # voxel-center lidar coordinates, layout (Y, X, Z, 3)
        ix = jnp.arange(self.nx, dtype=jnp.float32) + 0.5
        iy = jnp.arange(self.ny, dtype=jnp.float32) + 0.5
        iz = jnp.arange(self.nz, dtype=jnp.float32) + 0.5
        gy, gx, gz = jnp.meshgrid(iy, ix, iz, indexing="ij")
        grid = jnp.stack([gx, gy, gz], axis=-1)  # note: (Y, X, Z, [x_idx, y_idx, z_idx])
        self.lidar_grid = grid * self.voxel_size + self.pc_min

    def __call__(self, lidar_to_cam, cam_to_img, image_shape, bda=None):
        """lidar_to_cam (B,4,4), cam_to_img (B,3,4), image_shape (2,) static
        (H, W), bda (B,4,4) lidar augmentation matrix. Returns (B,Y,X,Z,3)."""
        b = lidar_to_cam.shape[0]
        pts = jnp.broadcast_to(
            self.lidar_grid[None], (b,) + self.lidar_grid.shape
        )  # (B, Y, X, Z, 3)
        if self.bev_aug:
            if bda is None:
                raise ValueError(
                    "BEV_AUG is enabled but the batch has no "
                    "lidar_aug_matrix — sampling would silently use the "
                    "augmented (misaligned) voxel positions"
                )
            inv_bda = jnp.linalg.inv(bda)  # (B, 4, 4)
            rot = inv_bda[:, :3, :3]
            trans = inv_bda[:, :3, 3]
            pts = (
                jnp.einsum("byxzi,bji->byxzj", pts, rot)
                + trans[:, None, None, None, :]
            )
        # lidar -> camera
        rot = lidar_to_cam[:, :3, :3]
        trans = lidar_to_cam[:, :3, 3]
        cam = jnp.einsum("byxzi,bji->byxzj", pts, rot) + trans[:, None, None, None, :]
        # pinhole projection (transform_utils.project_to_image:16-37)
        proj = cam_to_img  # (B, 3, 4)
        p = (
            jnp.einsum("byxzi,bji->byxzj", cam, proj[:, :, :3])
            + proj[:, None, None, None, :, 3]
        )
        depth = p[..., 2] - proj[:, 2, 3][:, None, None, None]
        uv = p[..., 0:2] / p[..., 2:3]
        dbin = bin_depths(depth, **self.disc_cfg)

        num_bins = self.disc_cfg["num_bins"]
        h, w = image_shape
        norm = jnp.asarray([w - 1, h - 1, num_bins - 1], jnp.float32)
        grid = jnp.concatenate([uv, dbin[..., None]], axis=-1) / norm * 2.0 - 1.0
        return jnp.where(jnp.isfinite(grid), grid, -2.0)


def _nested_refine_2x(x):
    """(B, h, w, C) -> (B, 2h-1, 2w-1, C): align_corners midpoint refinement.

    The output knots are the input knots plus cell midpoints, so bilinear
    interpolation of the result reproduces the input's bilinear surface
    exactly (used by the cross-resolution gather merge below)."""
    b, h, w, c = x.shape
    mid_h = 0.5 * (x[:, :-1] + x[:, 1:])
    rows = jnp.stack([x[:, :-1], mid_h], axis=2).reshape(b, 2 * (h - 1), w, c)
    rows = jnp.concatenate([rows, x[:, -1:]], axis=1)  # (B, 2h-1, w, C)
    mid_w = 0.5 * (rows[:, :, :-1] + rows[:, :, 1:])
    out = jnp.stack([rows[:, :, :-1], mid_w], axis=3).reshape(
        b, 2 * h - 1, 2 * (w - 1), c
    )
    return jnp.concatenate([out, rows[:, :, -1:]], axis=2)  # (B, 2h-1, 2w-1, C)


def merge_nested_groups(f_fine, f_coarse):
    """Pack a fine map and a 2x-coarser NESTED map into ONE canvas so a
    single gather serves both — EXACTLY, including the zeros-padding fade.

    Sampling with 'zeros' padding fades each map to zero over one pixel of
    ITS OWN resolution, so a naive channel concat of refine(coarse) with
    fine would fade the coarse features twice as fast at the border. Fix:
    zero-ring the coarse map FIRST (one coarse pixel), refine the ringed
    map (midpoints bake the coarse fade into the data), and embed the fine
    map with a 2-fine-pixel zero margin on the same canvas. Bilinear
    sampling of the canvas then reproduces both maps' reference semantics
    at every coordinate.

    Returns (canvas (B, hf+4, wf+4, Cf+Cc), remap) where remap maps the
    fine-convention normalized uv to canvas-convention uv.
    """
    b, hf, wf, _ = f_fine.shape
    hc, wc = f_coarse.shape[1:3]
    assert hf - 1 == 2 * (hc - 1) and wf - 1 == 2 * (wc - 1)
    coarse_ring = jnp.pad(f_coarse, ((0, 0), (1, 1), (1, 1), (0, 0)))
    up = _nested_refine_2x(coarse_ring)  # (B, hf+4, wf+4, Cc)
    fine_pad = jnp.pad(f_fine, ((0, 0), (2, 2), (2, 2), (0, 0)))
    canvas = jnp.concatenate([fine_pad, up], axis=-1)

    def remap(uv):
        # fine pixel p = (u+1)/2 (n-1); canvas u' = 2 (p+2)/(n+3) - 1
        pf_x = (uv[..., 0] + 1.0) * 0.5 * (wf - 1)
        pf_y = (uv[..., 1] + 1.0) * 0.5 * (hf - 1)
        return jnp.stack(
            [2.0 * (pf_x + 2.0) / (wf + 3) - 1.0,
             2.0 * (pf_y + 2.0) / (hf + 3) - 1.0], axis=-1
        )

    return canvas, remap


class FrustumToVoxelMultiScale(nn.Module):
    """Sample per-scale image features into the voxel grid and reduce.

    frustum_to_voxel_multi_scale.py:47-109 with FUSE_MODE 'CONCAT' and
    USE_DEPTH False: 4x 2-D bilinear samples -> concat (256ch) -> 1x1x1
    Conv3d + BN3d + ReLU -> (B, Y, X, Z, out_channels). The 1x1x1 conv is a
    Dense over the channel axis; BN3d reduces over (B, Y, X, Z).
    """

    out_channels: int = 128
    fuse_mode: str = "CONCAT"
    dtype: object = None  # compute dtype for the reduce matmul
    num_depth_bins: int = 80  # D of the frustum volume when use_depth
    # Cross-resolution single-gather merge (merge_nested_groups): exact when
    # grids nest, but MEASURED SLOWER on v5e — the quad-row width doubles to
    # 2 KB and the gather + 4-tap weighted combine degrades (102 ms merged
    # vs 67 ms split at VoD scale), despite the bare-gather microbenchmark
    # suggesting near-width-independence. Kept for hardware where fat rows
    # win; off by default.
    merge_nested_gather: bool = False
    # Gather-payload quantization ("none" | "int8"): int8 halves the bytes
    # the HBM-bound f2v gather + tap combine move (BASELINE.md); per-channel
    # scales are folded into the reduce kernel so dequantization is exact
    # algebra and the only approximation is the 0.5-ulp rounding of the
    # source maps. Backward is straight-through (exact bf16 sampler VJP).
    quant: str = "none"
    # Sampler kernel ("xla" | "pallas"): pallas runs the quad gather + tap
    # combine (and its scatter backward) as fused Pallas TPU kernels with
    # the source map VMEM-resident (ops/pallas_sample.py). Same numerics
    # as the XLA path; coords get zero grad (calibration geometry).
    # Mutually exclusive with quant="int8" (pallas path is bf16-payload).
    sampler_kernel: str = "xla"

    def _sample_with_depth(self, f, probs, grid, cdt):
        """Exact trilinear sampling of the frustum volume probs*feat without
        materializing the (B, C, D, H, W) volume.

        The frustum feature F[c,d,h,w] = probs[d,h,w] * feat[c,h,w] is
        separable in d: trilinear(F) = sum_taps w_hw * feat[c,hw] *
        lerp_d(probs[:,hw]) — the depth-lerped product is taken PER bilinear
        tap (bilinear(a*b) != bilinear(a)*bilinear(b)). We gather
        [feat | probs] rows quad-packed with per-tap weights — reference
        semantics of grid_sample on (B, C, D, H, W) with align_corners=True,
        zeros padding (sampler.py:36, create_frustum_features
        ffn/depth_ffn.py:176-201).
        """
        from ..ops.grid_sample import grid_sample_2d_quad_taps

        d_bins = probs.shape[-1]
        c_f = f.shape[-1]
        combo = jnp.concatenate([f.astype(cdt), probs.astype(cdt)], axis=-1)
        rows, w_taps = grid_sample_2d_quad_taps(combo, grid[..., 0:2])
        feat_s = rows[..., :c_f]  # (..., 4, C)
        probs_s = rows[..., c_f:]  # (..., 4, D)
        # unnormalize the depth coordinate: align_corners over D bins
        dc = (grid[..., 2] + 1.0) * 0.5 * (d_bins - 1)
        d0 = jnp.floor(dc)
        td = (dc - d0).astype(cdt)
        bins = jnp.arange(d_bins, dtype=jnp.float32)
        in0 = (d0 >= 0) & (d0 <= d_bins - 1)
        in1 = (d0 + 1 >= 0) & (d0 + 1 <= d_bins - 1)
        w_bins = (
            (bins == d0[..., None]).astype(cdt)
            * ((1 - td) * in0.astype(cdt))[..., None]
            + (bins == (d0[..., None] + 1)).astype(cdt)
            * (td * in1.astype(cdt))[..., None]
        )  # (..., D)
        pd = jnp.sum(probs_s * w_bins[..., None, :], axis=-1)  # (..., 4)
        return jnp.sum(feat_s * (pd * w_taps)[..., None], axis=-2)

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], grid, train: bool,
                 depth_probs: Sequence[jnp.ndarray] | None = None):
        """features: list of (B, Hi, Wi, C) image feature maps;
        grid: (B, Y, X, Z, 3) normalized sampling grid; depth_probs: optional
        per-scale (B, Hi, Wi, D) softmaxed depth distributions (USE_DEPTH)."""
        from ..ops.grid_sample import grid_sample_2d, grid_sample_2d_quad

        if self.sampler_kernel == "pallas":
            # fail loudly instead of silently falling back: the int8 payload
            # and the USE_DEPTH factorized-trilinear path run XLA samplers
            # only, and a user benchmarking "the pallas kernel" must not
            # measure the wrong one
            if self.quant == "int8":
                raise ValueError(
                    "F2V.SAMPLER_KERNEL: pallas is mutually exclusive with "
                    "QUANT: int8 (the pallas path is bf16-payload)")
            if depth_probs is not None or self.fuse_mode == "ADD":
                raise NotImplementedError(
                    "F2V.SAMPLER_KERNEL: pallas covers the CONCAT "
                    "grouped-quad path only (not USE_DEPTH / FUSE_MODE "
                    "ADD); unset SAMPLER_KERNEL for those")

        uv = grid[..., 0:2]
        if self.fuse_mode == "ADD":
            if depth_probs is not None:
                # depth-weighted frustum volumes summed across scales
                # (reference ADD mode over create_frustum_features outputs)
                cdt0 = self.dtype or jnp.float32
                return sum(
                    self._sample_with_depth(f, p, grid, cdt0)
                    for f, p in zip(features, depth_probs)
                )
            return sum(grid_sample_2d(f, uv) for f in features)
        # Dense(concat(samples)) computed as a sum of per-scale matmuls so the
        # (B, Y, X, Z, sum_C) concat volume (GBs at full VoD scale) is never
        # materialized; the kernel is stored concatenated for ckpt parity.
        c_per = [f.shape[-1] for f in features]
        kernel = self.param(
            "reduce_kernel",
            nn.initializers.lecun_normal(),
            (sum(c_per), self.out_channels),
        )
        bias = self.param("reduce_bias", nn.initializers.zeros, (self.out_channels,))
        cdt = self.dtype or jnp.float32

        vox = bias.astype(jnp.float32)
        if depth_probs is not None:
            # USE_DEPTH: per-scale frustum volumes, factorized trilinear
            off = 0
            for f, probs, c in zip(features, depth_probs, c_per):
                sampled = self._sample_with_depth(f, probs, grid, cdt)
                vox = vox + jnp.einsum(
                    "byxzc,co->byxzo", sampled,
                    kernel[off : off + c].astype(cdt),
                    preferred_element_type=jnp.float32,
                )
                off += c
            vox = vox.astype(cdt)
            vox = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(vox)
            return nn.relu(vox)

        # Group same-resolution maps (scales 2-4 all live at the backbone's
        # /8 resolution): one fat gather serves the whole group — gather cost
        # on TPU is per-row, so fewer wide rows win. Same uv grid for every
        # scale, so this is numerically identical to per-scale sampling.
        groups = []  # (feat (B,H,W,Cg), kernel rows offset)
        off = 0
        for f, c in zip(features, c_per):
            if groups and groups[-1][0].shape[1:3] == f.shape[1:3]:
                prev_f, prev_off = groups[-1]
                groups[-1] = (jnp.concatenate([prev_f, f], axis=-1), prev_off)
            else:
                groups.append((f, off))
            off += c

        # Cross-resolution merge: when the coarse grid NESTS in the fine one
        # ((Hf-1) == 2 (Hc-1) and likewise for W, i.e. align_corners knots
        # coincide), a single canvas serves BOTH groups exactly — a bilinear
        # surface is reproduced by bilinear interpolation of its values on
        # any nested refinement, and the coarse map's zeros-padding fade is
        # baked in via a one-coarse-pixel ring (merge_nested_groups). Gather
        # cost is per-row (measured 12.8 -> 15.5 ns/row from 512B to 2KB
        # rows), so ONE fat gather halves the f2v gather time. Non-nesting
        # dims (e.g. the legacy 1936-wide image pad: /4 width 484 is even so
        # 483 != 2*241) keep the two-gather path, bit-identical to before.
        uv_by_group = {id(f): uv for f, _ in groups}
        if self.merge_nested_gather and len(groups) == 2:
            (f_fine, off_fine), (f_coarse, _) = groups
            hf, wf = f_fine.shape[1:3]
            hc, wc = f_coarse.shape[1:3]
            if (
                off_fine == 0
                and hf - 1 == 2 * (hc - 1)
                and wf - 1 == 2 * (wc - 1)
            ):
                canvas, remap = merge_nested_groups(f_fine, f_coarse)
                groups = [(canvas, 0)]
                uv_by_group = {id(canvas): remap(uv)}

        for f, k_off in groups:
            cg = f.shape[-1]
            k_rows = kernel[k_off : k_off + cg]
            if self.quant == "int8":
                from ..ops.grid_sample import grid_sample_2d_quad_q8

                sampled, scale = grid_sample_2d_quad_q8(
                    f, uv_by_group[id(f)], cdt
                )  # unscaled; fold the per-channel scales into the kernel
                k_rows = k_rows * scale[:, None]
            elif self.sampler_kernel == "pallas":
                from ..ops.pallas_sample import grid_sample_2d_quad_pallas

                sampled = grid_sample_2d_quad_pallas(
                    f.astype(cdt), uv_by_group[id(f)]
                )  # (B, Y, X, Z, cg)
            else:
                sampled = grid_sample_2d_quad(
                    f.astype(cdt), uv_by_group[id(f)]
                )  # (B, Y, X, Z, cg)
            vox = vox + jnp.einsum(
                "byxzc,co->byxzo", sampled, k_rows.astype(cdt),
                preferred_element_type=jnp.float32,
            )
        vox = vox.astype(cdt)
        vox = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(vox)
        return nn.relu(vox)


class FrustumToVoxelSingleScale(nn.Module):
    """Single-scale frustum -> voxel sampling (no reduce conv).

    TPU-native equivalent of the registered-but-unused single-scale
    FrustumToVoxel (f2v/frustum_to_voxel.py:8-75): trilinearly sample the
    depth-weighted frustum volume probs*feat at the voxel grid and return
    it as (B, Y, X, Z, C) — the reference's Sampler grid_sample on the
    materialized (B, C, D, H, W) volume, done here with the factorized
    per-tap depth lerp (no 5-D volume materialization). With use_depth
    False the depth coordinate is dead (D=1 + align_corners, see module
    docstring) and it reduces to 2-D bilinear sampling.
    """

    use_depth: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, feature, grid, train: bool, depth_probs=None):
        """feature: (B, H, W, C); grid: (B, Y, X, Z, 3) normalized;
        depth_probs: (B, H, W, D) softmaxed depth distribution."""
        from ..ops.grid_sample import grid_sample_2d

        cdt = self.dtype or jnp.float32
        if self.use_depth and depth_probs is not None:
            return FrustumToVoxelMultiScale._sample_with_depth(
                self, feature, depth_probs, grid, cdt)
        return grid_sample_2d(feature.astype(cdt), grid[..., 0:2])
