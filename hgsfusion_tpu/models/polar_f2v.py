"""Polar-factorized image->BEV view transform (f2v + Z-collapse fused).

Algorithmic replacement for the gather-based frustum sampler
(FrustumToVoxelMultiScale + Conv2DCollapse; reference semantics
pcdet/.../f2v/frustum_to_voxel_multi_scale.py:86-96 followed by
radar_occupancy_2d_v2.py:53-84), motivated by the measured roofline:
the per-voxel quad gather moves ~17 GB of HBM per frame (86.4 ms of a
103 ms forward, `_bench_stages.py` round 4) because every one of the
3.17 M (y, x, z) voxels gathers its own 4-tap row.

Key geometric fact (exact for any 3x4 projection M = cam_to_img @
lidar_to_cam [@ inv(bda)]):

  For a BEV cell at (x, y) define w' = m20 x + m21 y + m22 z_ref + m23
  (depth along the projection's normalizer) and zeta = 1/w'. Given the
  polar coordinates (u, zeta) of a cell, (x, y) is recovered by a 2x2
  linear solve, and the image row v of its z-column is

      v(u, zeta, z) = (m10 x + m11 y + m12 z + m13)
                    / (m20 x + m21 y + m22 z + m23)

  which for fixed (zeta, z) is EXACTLY affine in u: the denominator is
  u-free because m20 x + m21 y = 1/zeta - m22 z_ref - m23 by
  construction, and (x, y) are affine in u through the linear solve.
  So on a regular (u, zeta) grid the whole z-column of sampling rows is
  a shear-plus-row-select of the image — a REGULAR computation — and
  only the final polar->Cartesian BEV warp needs a gather, with ONE row
  per BEV cell (102 k rows at VoD scale) instead of one per voxel
  (3.17 M rows), after the Z axis has already been collapsed.

Pipeline (per scale group, batched):
  1. reduce-first: f_s @ K_s — the f2v 1x1x1 reduce commutes with
     bilinear sampling (linear per channel), so sampling happens on
     128-ch maps instead of 64/192-ch quad rows.
  2. vertical resample onto the polar grid: hat-function interp
     matrices Wv[j, z, h] (the 2-tap zeros-padded lerp is exactly
     relu(1 - |v0 - h|)) contracted over image rows h — an MXU matmul.
     A per-column constant shear absorbs v's (exact) affine
     u-dependence for tilted rigs.
  3. sum scales + reduce bias -> BN -> ReLU -> Z-collapse with the
     map_to_bev kernel — all at polar nodes; output is a (J, K, 128)
     polar BEV table (tens of MB, not the 812 MB voxel volume).
  4. pass 3: one 4-tap gather of the polar table at each far-field BEV
     cell's (u*, zeta*), clamped so off-image cells read the dead
     zero-feature edge nodes.
  5. near field (first `near_columns` BEV columns, where the zeta node
     density a uniform grid would need explodes): exact quad-gather
     side path on the reduced maps (sample(f) @ K == sample(f @ K), so
     this slice reproduces the gather path exactly).

Approximations vs the exact gather path (quantified in
tests/test_polar_f2v.py):
  * zeta-lerp: between zeta nodes the column value is lerped across a
    <= (v-travel-per-node) source-pixel window — a sub-pixel blur
    controlled by `zeta_bins`.
  * pass 3 interpolates the post-ReLU, post-collapse table, i.e. ReLU
    and the bilinear warp are commuted (identical wherever the pre-BN
    activation does not change sign inside a cell's 4-tap footprint).
  * u and zeta of a cell are evaluated at z_ref (mid z); the residual
    error terms are m02*(z - z_ref)*zeta px in u and m22*(z - z_ref)
    in w' — identically ZERO for axis-aligned rigs (the flagship bench
    calibration) and O(rig tilt) otherwise.
  * the shear uses one global slope per frame; the per-(zeta, z) exact
    slopes differ by O(m11, m21) — again zero for axis-aligned rigs.
  * train-mode BatchNorm statistics for the f2v BN are computed over
    polar nodes + near-field voxels rather than Cartesian voxels.

Parameter tree matches the gather path exactly (the caller creates the
`_F2VScope`/`_CollapseScope` containers under its own "f2v" and
"map_to_bev" names), so checkpoints move freely between the two paths.

Scope: USE_DEPTH False, FUSE_MODE CONCAT (the shipped flagship
configs); QUANT int8 and the pallas sampler are gather-path options.
REMAT is honored (pass remat=True): the pass-2 resample/shear
intermediates are recomputed in the backward pass via jax.checkpoint.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _project_uv_zeta(m, x, y, z_ref):
    """Per-cell polar coordinates (u, zeta) at the reference height.

    m: (3, 4); x, y broadcastable cell positions. Behind-camera cells
    (w' <= eps) are pushed to u = -1e9 so the pass-3 clamp lands them on
    the zero-padding column (dead constant)."""
    wp = m[2, 0] * x + m[2, 1] * y + m[2, 2] * z_ref + m[2, 3]
    safe = wp > 1e-4
    wp_s = jnp.where(safe, wp, 1.0)
    zeta = jnp.where(safe, 1.0 / wp_s, 0.0)
    u = (m[0, 0] * x + m[0, 1] * y + m[0, 2] * z_ref + m[0, 3]) * zeta
    u = jnp.where(safe, u, -1e9)
    return u, zeta


def _solve_cell(m, u, zeta, z_ref):
    """Invert (u, zeta) -> (x, y) at z_ref: 2x2 linear solve (exact)."""
    rhs1 = u / zeta - m[0, 2] * z_ref - m[0, 3]
    rhs2 = 1.0 / zeta - m[2, 2] * z_ref - m[2, 3]
    det = m[0, 0] * m[2, 1] - m[0, 1] * m[2, 0]
    x = (rhs1 * m[2, 1] - rhs2 * m[0, 1]) / det
    y = (m[0, 0] * rhs2 - m[2, 0] * rhs1) / det
    return x, y


def _v_exact(m, u, zeta, z, z_ref):
    """Exact image row v for the cell at polar (u, zeta) and height z.

    u, zeta, z broadcast together (pass zeta as (..., 1) against z (Z,)
    to get a (..., Z) result)."""
    x, y = _solve_cell(m, u, zeta, z_ref)
    num = m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + m[1, 3]
    den = m[2, 0] * x + m[2, 1] * y + m[2, 2] * z + m[2, 3]
    return num / den


def _shear_rows(src, shift):
    """Vertical fractional shear: out[h, k] = src[h + shift[k], k].

    src: (B, H, K, C); shift: (B, K). Out-of-range rows read zero (the
    sampler's 'zeros' padding semantics)."""
    h = src.shape[1]
    pos = jnp.arange(h, dtype=shift.dtype)[None, :, None] + shift[:, None, :]
    i0 = jnp.floor(pos)
    t = (pos - i0).astype(src.dtype)[..., None]

    def take(idx):
        ok = ((idx >= 0) & (idx <= h - 1)).astype(src.dtype)[..., None]
        ic = jnp.clip(idx, 0, h - 1).astype(jnp.int32)
        return jnp.take_along_axis(src, ic[..., None], axis=1) * ok

    return take(i0) * (1.0 - t) + take(i0 + 1.0) * t


def _hat_weights(v0, num_rows):
    """Zeros-padded 2-tap lerp as a hat matrix: W[..., h] = relu(1-|v0-h|).

    Exactly reproduces bilinear interpolation with 'zeros' padding along
    one axis, including the 1-px border fade (the missing outside tap
    contributes zero)."""
    rows = jnp.arange(num_rows, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(v0[..., None] - rows))


def _resample_cols(src, pad_dst: int, n_dst: int, ratio: float):
    """Static 2-tap column resample from a scale's own zero-padded grid
    onto the common padded u-grid.

    src: (B, H, Ws + 2, C), padded with one zero column each side.
    Destination node k (of n_dst total, the first pad_dst off-image)
    sits at source fractional column (k - pad_dst) * ratio + 1."""
    kd = jnp.arange(n_dst, dtype=jnp.float32) - pad_dst
    pos = kd * ratio + 1.0
    i0 = jnp.floor(pos)
    t = (pos - i0).astype(src.dtype)[None, None, :, None]
    wp_src = src.shape[2]

    def take(idx):
        ok = ((idx >= 0) & (idx <= wp_src - 1)).astype(src.dtype)
        ic = jnp.clip(idx, 0, wp_src - 1).astype(jnp.int32)
        return src[:, :, ic, :] * ok[None, None, :, None]

    return take(i0) * (1.0 - t) + take(i0 + 1.0) * t


class _F2VScope(nn.Module):
    """Parameter container mirroring FrustumToVoxelMultiScale's tree.

    Instantiate with name="f2v" in the caller's scope; calling it
    applies the f2v BatchNorm."""

    sum_channels: int
    out_channels: int
    dtype: object = None

    def setup(self):
        self.reduce_kernel = self.param(
            "reduce_kernel", nn.initializers.lecun_normal(),
            (self.sum_channels, self.out_channels))
        self.reduce_bias = self.param(
            "reduce_bias", nn.initializers.zeros, (self.out_channels,))
        self.bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                               dtype=self.dtype, name="bn")

    def __call__(self, x, train: bool):
        return self.bn(x, use_running_average=not train)


class _CollapseScope(nn.Module):
    """Parameter container mirroring Conv2DCollapse's tree.

    Instantiate with name="map_to_bev" in the caller's scope; calling
    it applies the map_to_bev BatchNorm."""

    in_channels: int
    nz: int
    out_channels: int
    dtype: object = None

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_channels * self.nz, self.out_channels))
        self.bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                               dtype=self.dtype, name="bn")

    def __call__(self, x, train: bool):
        return self.bn(x, use_running_average=not train)


def polar_image_bev(scope: _F2VScope, collapse: _CollapseScope,
                    features, l2c, c2i, image_size, bda, train: bool, *,
                    grid_size, pc_range, zeta_bins: int = 192,
                    near_columns: int = 20, bev_aug: bool = False,
                    remat: bool = False, dtype=None):
    """Fused polar f2v + Z-collapse producing the image BEV directly.

    `scope`/`collapse` are parameter containers the CALLER creates in
    its own module scope (named "f2v" / "map_to_bev") so the parameter
    tree matches the gather path's exactly. features: list of
    (B, Hs, Ws, Cs) maps, finest first (the channel-reduce outputs);
    l2c (B,4,4); c2i (B,3,4); image_size static (H, W); bda (B,4,4)
    lidar aug matrix or None. Returns (B, Y, X, bev_channels) — what
    Conv2DCollapse would emit on the gather path's voxel volume."""
    from ..ops.grid_sample import grid_sample_2d_quad
    from .frustum import FrustumGridGenerator

    cdt = dtype or jnp.float32
    nx, ny, nz = (int(g) for g in grid_size)
    n_near = min(int(near_columns), nx)
    jbins = int(zeta_bins)
    if jbins < 2:
        raise ValueError("zeta_bins must be >= 2")
    h_img, w_img = (int(s) for s in image_size)
    bsz = l2c.shape[0]

    # ---- projection matrix per batch element (bda folded in)
    m = jnp.einsum("bij,bjk->bik", c2i, l2c)  # (B, 3, 4)
    if bev_aug:
        if bda is None:
            raise ValueError(
                "BEV_AUG is enabled but the batch has no "
                "lidar_aug_matrix (see FrustumGridGenerator)")
        m = jnp.einsum("bij,bjk->bik", m, jnp.linalg.inv(bda))

    # ---- same-resolution scale groups (mirrors the gather path)
    c_per = [f.shape[-1] for f in features]
    groups = []  # (feat, kernel row offset)
    off = 0
    for f, c in zip(features, c_per):
        if groups and groups[-1][0].shape[1:3] == f.shape[1:3]:
            prev_f, prev_off = groups[-1]
            groups[-1] = (jnp.concatenate([prev_f, f], axis=-1), prev_off)
        else:
            groups.append((f, off))
        off += c

    # reduce-first: the per-channel-linear reduce commutes with bilinear
    # sampling, so sample out_channels-wide maps
    out_channels = scope.out_channels
    reduced = []
    for f, k_off in groups:
        cg = f.shape[-1]
        k_rows = scope.reduce_kernel[k_off : k_off + cg].astype(cdt)
        reduced.append(
            jnp.einsum("bhwc,co->bhwo", f.astype(cdt), k_rows,
                       preferred_element_type=jnp.float32).astype(cdt))

    # ---- geometry statics: voxel-center coordinates
    pc = [float(v) for v in pc_range]
    vx = (pc[3] - pc[0]) / nx
    xs = pc[0] + (jnp.arange(nx, dtype=jnp.float32) + 0.5) * vx
    ys = pc[1] + (jnp.arange(ny, dtype=jnp.float32) + 0.5) * (
        (pc[4] - pc[1]) / ny)
    zs = pc[2] + (jnp.arange(nz, dtype=jnp.float32) + 0.5) * (
        (pc[5] - pc[2]) / nz)
    z_ref = 0.5 * (pc[2] + pc[5])

    # per-cell polar coordinates at z_ref: (B, Y, X)
    cell_x = jnp.broadcast_to(xs[None, None, :], (bsz, ny, nx))
    cell_y = jnp.broadcast_to(ys[None, :, None], (bsz, ny, nx))
    u_cell, zeta_cell = jax.vmap(
        lambda mm, xx, yy: _project_uv_zeta(mm, xx, yy, z_ref)
    )(m, cell_x, cell_y)

    # ---- common padded u-grid = finest scale's columns + dead pads
    w_fine = groups[0][0].shape[2]
    s_fine = (w_img - 1) / (w_fine - 1)  # orig px per fine column
    pad_u = 3  # fully outside every scale's 1-src-px border fade
    kp = w_fine + 2 * pad_u
    k_ref = (kp - 1) / 2.0
    u_ref = (k_ref - pad_u) * s_fine

    # far-field zeta span (near columns go through the exact path).
    # Cells that can only ever read a zeta-independent constant are
    # excluded from the range reduction so they don't stretch the node
    # grid and dilute node density for live cells. Provably dead =
    # beyond the pass-3 clamp boundaries (px_u <= 0 or >= kp-1): the
    # clamped quad gather then reads ONLY slab column 0 / kp-1, and
    # those extreme columns read pure zero padding in _resample_cols
    # for every scale with ratio >= 1/3 — the same assumption pad_u=3
    # already encodes (k=0: pos = 1-3*ratio <= 0; k=kp-1: pos =
    # ws + 3*ratio >= ws+1). Zero content -> bias+BN constant,
    # j-independent after Z-collapse, so zeta_nodes placement cannot
    # matter for these cells. This window also catches the
    # behind-camera / near-plane sentinel (u = -1e9, zeta = 0 from
    # _project_uv_zeta), which would otherwise pin z_lo to 0.
    zeta_far = zeta_cell[:, :, n_near:].reshape(bsz, -1)
    u_far = u_cell[:, :, n_near:].reshape(bsz, -1)
    live = ((u_far > -pad_u * s_fine)
            & (u_far < (w_fine + pad_u - 1) * s_fine))
    any_live = jnp.any(live, axis=1)
    big = jnp.float32(3.4e38)
    z_lo = jnp.min(jnp.where(live, zeta_far, big), axis=1)  # (B,)
    z_hi = jnp.max(jnp.where(live, zeta_far, -big), axis=1)
    z_lo = jnp.where(any_live, z_lo, 0.0)
    z_hi = jnp.where(any_live, z_hi, 1.0)
    z_hi = jnp.maximum(z_hi, z_lo + 1e-6)
    frac = jnp.arange(jbins, dtype=jnp.float32) / (jbins - 1)
    zeta_nodes = z_lo[:, None] + frac[None, :] * (z_hi - z_lo)[:, None]

    # exact v at the reference column: (B, J, Z), plus the global shear
    # slope from two exact evaluations (v is affine in u)
    v0 = jax.vmap(
        lambda mm, zn: _v_exact(mm, u_ref, zn[:, None], zs[None, :], z_ref)
    )(m, zeta_nodes)  # (B, J, Z)
    zeta_mid = 0.5 * (z_lo + z_hi)
    du = (w_img - 1) * 0.25
    v_lr = jax.vmap(
        lambda mm, zm: _v_exact(
            mm, jnp.stack([u_ref - du, u_ref + du]), zm, z_ref, z_ref)
    )(m, zeta_mid)  # (B, 2)
    lam = (v_lr[:, 1] - v_lr[:, 0]) / (2.0 * du)  # (B,) dv/du, orig px

    # ---- pass 2 per scale onto the common polar grid, summed
    slab = None
    for f_red in reduced:
        hs, ws = f_red.shape[1:3]
        ratio = s_fine / ((w_img - 1) / (ws - 1))
        row_scale = (hs - 1) / (h_img - 1)

        def _pass2(f_red, lam, v0, *, _ratio=ratio, _rs=row_scale, _hs=hs):
            padded = jnp.pad(f_red, ((0, 0), (0, 0), (1, 1), (0, 0)))
            src = _resample_cols(padded, pad_u, kp, _ratio)
            shift = (lam[:, None]
                     * (jnp.arange(kp, dtype=jnp.float32)[None, :] - k_ref)
                     * s_fine * _rs)
            sheared = _shear_rows(src, shift)
            wv = _hat_weights(v0 * _rs, _hs).astype(cdt)
            # (B, J, Z, K, C): the matmul-native output order — (j z) x
            # (k c) contraction over h lands directly in this layout,
            # where the bjkzc order would force XLA to transpose the
            # whole slab (hundreds of MB at flagship scale) after the
            # MXU pass
            return jnp.einsum(
                "bjzh,bhkc->bjzkc", wv, sheared,
                preferred_element_type=jnp.float32).astype(cdt)

        # REMAT (detector cfg.remat): recompute the resample/shear
        # intermediates in the backward pass instead of saving them —
        # the polar analog of the gather path's nn.remat(f2v). Measured
        # timing-neutral on chip (BASELINE.md round-4 addendum); the
        # pre-slab intermediates (src/sheared, ~slab-sized each) are
        # what it shields.
        pass2 = jax.checkpoint(_pass2) if remat else _pass2
        part = pass2(f_red, lam, v0)
        slab = part if slab is None else slab + part
    slab = slab + scope.reduce_bias.astype(cdt)  # (B, J, Z, K, C)

    # ---- exact near-field side path on the reduced maps
    near = None
    if n_near > 0:
        near_gen = FrustumGridGenerator(
            grid_size=(n_near, ny, nz),
            pc_range=(pc[0], pc[1], pc[2],
                      pc[0] + n_near * vx, pc[4], pc[5]),
            disc_cfg={"mode": "UD", "depth_min": 0.0, "depth_max": 1.0,
                      "num_bins": 2},
            bev_aug=bev_aug,
        )
        uv = near_gen(l2c, c2i, image_size, bda=bda)[..., 0:2]
        for f_red in reduced:
            s = grid_sample_2d_quad(f_red, uv)  # (B, Y, Nn, Z, C)
            near = s if near is None else near + s
        near = near + scope.reduce_bias.astype(cdt)

    # ---- shared f2v BN + ReLU
    if near is not None and train:
        # train: ONE call => one running-stats update over slab+near
        # jointly (closest to the gather path's single-volume stats)
        flat_slab = slab.reshape(-1, out_channels)
        flat_near = near.reshape(-1, out_channels)
        joined = scope(jnp.concatenate([flat_slab, flat_near], axis=0),
                       train)
        near = nn.relu(joined[flat_slab.shape[0]:]).reshape(near.shape)
        slab = nn.relu(joined[: flat_slab.shape[0]]).reshape(slab.shape)
    else:
        # eval: running-stats BN is elementwise, so separate calls are
        # EXACTLY the joined result — and joining would concat-copy the
        # whole slab (hundreds of MB) just to share one call: measured
        # ~2x the whole polar f2v stage cost at flagship scale (the
        # N8-vs-N0 fixed gap in _bench_polar_f2v.py round 4)
        slab = nn.relu(scope(slab, train))
        if near is not None:
            near = nn.relu(scope(near, train))

    # ---- Z-collapse at polar nodes (and on the near slice)
    k2 = collapse.kernel.reshape(
        out_channels, nz, collapse.out_channels).astype(cdt)
    q = jnp.einsum("bjzkc,czo->bjko", slab, k2,
                   preferred_element_type=jnp.float32).astype(cdt)
    near_bev = None
    if near is not None:
        near_bev = jnp.einsum(
            "bynzc,czo->byno", near, k2,
            preferred_element_type=jnp.float32).astype(cdt)

    # ---- pass 3: one quad gather of the polar table per far cell
    px_u = jnp.clip(u_cell[:, :, n_near:] / s_fine + pad_u, 0.0, kp - 1.0)
    dz = (z_hi - z_lo) / (jbins - 1)
    px_z = jnp.clip(
        (zeta_cell[:, :, n_near:] - z_lo[:, None, None])
        / dz[:, None, None],
        0.0, jbins - 1.0)
    coords = jnp.stack(
        [px_u / (kp - 1) * 2.0 - 1.0, px_z / (jbins - 1) * 2.0 - 1.0],
        axis=-1)
    far_bev = grid_sample_2d_quad(q, coords)  # (B, Y, Xfar, O)

    bev = (far_bev if near_bev is None
           else jnp.concatenate([near_bev, far_bev], axis=2))

    # ---- map_to_bev BN + ReLU in Cartesian space (reference order)
    return nn.relu(collapse(bev, train))
