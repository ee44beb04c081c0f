"""Pallas TPU kernels for the f2v quad bilinear sampler.

Drop-in replacement for :func:`ops.grid_sample.grid_sample_2d_quad`
(reference semantics: torch grid_sample bilinear/zeros/align_corners on
each scale map, pcdet f2v/sampler.py:8-37), re-formulated for TPU:

- **Forward**: the quad source map (4 bilinear taps packed per row) is
  held resident in VMEM while a per-row dynamic-slice loop gathers query
  rows and applies the 4-tap weighted combine in-register. Only the
  combined c-channel row is written back, removing the N x 4c gathered
  intermediate that the XLA path round-trips through HBM.
- **Backward**: the quad cotangent is rank-1 per row (outer(w4, ct)); a
  scatter kernel builds it in-register from the (c)-row cotangent and the
  4 tap weights and accumulates into a VMEM-resident table, replacing
  XLA's HBM scatter-add (measured 31.9 ns/row) and the materialized
  N x 4c update array. The coords receive zero cotangent: the sampling
  grid is calibration geometry, never a learned quantity (reference
  passes image_features only through grid_sample's grad path into the
  backbone; the grid comes from lidar_to_cam/cam_to_img constants).
- Tables larger than the per-kernel VMEM budget are processed in
  channel-split passes (each pass slices the same taps' channel range, so
  the math is exactly the per-channel decomposition of the combine).

Numerics match grid_sample_2d_quad: same padded-map quad construction,
same w4 weights (zeros-padding masks folded in), bf16 tap combine.

Scope: single-chip serving/training. Under a multi-device mesh the op
still executes correctly, but GSPMD replicates it (pallas_call has no
partitioning rule), all-gathering the batch — keep SAMPLER_KERNEL: xla
for multi-chip data-parallel runs (the XLA gather partitions cleanly);
a shard_map wrapper over the batch axis is the upgrade path if pallas
multi-chip becomes worth it.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid_sample import _quad_idx_weights

TILE = 2048
# Mosaic constraint (measured on-chip 2026-08-19): fori_loop supports only
# unroll=1 or full unroll (=num_steps); unroll=8 is rejected outright.
# Full unroll of 2048 would explode compile time, so all kernels use
# unroll=1 — the per-row body is a dynamic VMEM read + 4 scalar-weighted
# vector ops, so the loop is VMEM/VPU-bound, not branch-bound.
# Per-kernel VMEM budget for the resident table. The Mosaic default limit
# is raised via vmem_limit_bytes; the flagship tables are 24 MB (g8) and
# 32 MB (g4). Tuned on-chip (see BASELINE.md round-2 pallas section).
TABLE_BUDGET_BYTES = 40 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024
# Table layout: "rows" packs the 4 taps per row ((P, 4c): one dynamic read
# per query, lane slices at c-multiples); "planes" keeps 4 separate tap
# planes ((4, P, c): no lane slicing, one dynamic middle-dim read). Both
# are numerically identical; the on-chip microbench picks the one Mosaic
# lowers faster (_bench_gather_pallas.py). Env-overridable so an on-chip
# Mosaic rejection is recoverable by a RERUN, not a source edit:
#   HGS_PALLAS_LAYOUT=planes python bench.py --vod_pallas
LAYOUT = os.environ.get("HGS_PALLAS_LAYOUT", "rows")


def _interpret() -> bool:
    # HGS_PALLAS_INTERPRET=1 forces interpret mode even on a TPU host —
    # needed for CPU-forced parity scripts (jax.default_device(cpu)) while
    # the default backend is the TPU, where Mosaic lowering would fail
    force = os.environ.get("HGS_PALLAS_INTERPRET")
    if force is not None:
        return force not in ("0", "false", "")
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _num_passes(p_pad: int, c: int, itemsize: int,
                layout: str | None = None) -> int:
    """Channel-split pass count: smallest split of c (already padded to a
    multiple of 32 => 128-lane quad rows) whose per-pass table fits the
    budget, measured in PHYSICAL VMEM bytes: Mosaic pads the lane
    (last) dimension to 128, so the planes layout's (4, P, ck) table
    allocates 4 * P * round_up(ck, 128) * itemsize — channel-splitting
    below ck=128 cannot shrink it further."""
    assert c % 32 == 0, c
    layout = LAYOUT if layout is None else layout
    for passes in (1, 2, 4, 8):
        ck = c // passes
        if c % passes or ck % 32:
            continue
        if layout == "planes":
            phys = 4 * p_pad * _round_up(ck, 128) * itemsize
        else:  # rows: lane dim 4*ck, a 128-multiple whenever ck % 32 == 0
            phys = p_pad * _round_up(4 * ck, 128) * itemsize
        if phys <= TABLE_BUDGET_BYTES:
            return passes
    raise ValueError(
        f"no channel split of c={c} fits the VMEM table budget "
        f"TABLE_BUDGET_BYTES={TABLE_BUDGET_BYTES} at rows={p_pad} "
        f"(layout={layout}; planes floors at round_up(ck,128) lanes); "
        f"lower the budget granularity or use SAMPLER_KERNEL: xla")


def _gather_combine(idx, table, w4, n_pad: int, c: int):
    """out[j] = sum_tap w4[j, tap] * table[idx[j], tap*c:(tap+1)*c]."""
    p_pad, cq = table.shape

    def kernel(idx_ref, table_ref, w_ref, out_ref):
        def body(i, carry):
            r = idx_ref[i]
            row = table_ref[r, :]
            # per-row tap weights come from SMEM as true scalars (the
            # guide's scalar-memory pattern): a dynamic vector-to-scalar
            # extract from a VMEM block is a lowering Mosaic may reject
            # or serialize; SMEM scalar reads are free
            dt = row.dtype
            out_ref[pl.ds(i, 1), :] = (
                row[0 * c : 1 * c] * w_ref[i, 0].astype(dt)
                + row[1 * c : 2 * c] * w_ref[i, 1].astype(dt)
                + row[2 * c : 3 * c] * w_ref[i, 2].astype(dt)
                + row[3 * c : 4 * c] * w_ref[i, 3].astype(dt)
            )[None, :]
            return carry

        jax.lax.fori_loop(0, TILE, body, 0, unroll=1)

    return pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((p_pad, cq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), table.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(idx, table, w4)


def _gather_combine_planes(idx, table4, w4, n_pad: int, c: int):
    """LAYOUT='planes' twin of _gather_combine: table4 (4, P, c)."""
    p_pad = table4.shape[1]

    def kernel(idx_ref, table_ref, w_ref, out_ref):
        def body(i, carry):
            r = idx_ref[i]
            rows = table_ref[:, r, :]  # (4, c)
            dt = rows.dtype
            out_ref[pl.ds(i, 1), :] = (
                rows[0] * w_ref[i, 0].astype(dt)
                + rows[1] * w_ref[i, 1].astype(dt)
                + rows[2] * w_ref[i, 2].astype(dt)
                + rows[3] * w_ref[i, 3].astype(dt)
            )[None, :]
            return carry

        jax.lax.fori_loop(0, TILE, body, 0, unroll=1)

    return pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((4, p_pad, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), table4.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(idx, table4, w4)


def _scatter_outer_planes(idx, ct, w4, p_pad: int, c: int):
    """LAYOUT='planes' twin of _scatter_outer: accumulator (4, P, c)."""
    n_pad = ct.shape[0]

    def kernel(idx_ref, ct_ref, w_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, carry):
            r = idx_ref[i]
            g = ct_ref[pl.ds(i, 1), :]
            dt = g.dtype
            w = jnp.stack([w_ref[i, 0].astype(dt), w_ref[i, 1].astype(dt),
                           w_ref[i, 2].astype(dt), w_ref[i, 3].astype(dt)])
            out_ref[:, r, :] += g * w[:, None]
            return carry

        jax.lax.fori_loop(0, TILE, body, 0, unroll=1)

    return pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((4, p_pad, c), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, p_pad, c), ct.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(idx, ct, w4)


def _scatter_outer(idx, ct, w4, p_pad: int, c: int):
    """table[idx[j], tap*c:(tap+1)*c] += w4[j, tap] * ct[j] (VMEM acc)."""
    n_pad = ct.shape[0]

    def kernel(idx_ref, ct_ref, w_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, carry):
            r = idx_ref[i]
            g = ct_ref[pl.ds(i, 1), :]
            dt = g.dtype
            row = jnp.concatenate(
                [g * w_ref[i, 0].astype(dt), g * w_ref[i, 1].astype(dt),
                 g * w_ref[i, 2].astype(dt), g * w_ref[i, 3].astype(dt)],
                axis=-1)
            out_ref[pl.ds(r, 1), :] += row
            return carry

        jax.lax.fori_loop(0, TILE, body, 0, unroll=1)

    return pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((p_pad, 4 * c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, 4 * c), ct.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(idx, ct, w4)


def _quad_pass(fp, k0, k1):
    """Quad table for channels [k0:k1): 4 shifted views of the padded map,
    concatenated per row (same construction as grid_sample_2d_quad)."""
    b = fp.shape[0]
    f = fp[..., k0:k1]
    hp, wp = fp.shape[1] - 1, fp.shape[2] - 1
    return jnp.concatenate(
        [f[:, :-1, :-1], f[:, :-1, 1:], f[:, 1:, :-1], f[:, 1:, 1:]],
        axis=-1,
    ).reshape(b * hp * wp, 4 * (k1 - k0))


def _quad_pass_planes(fp, k0, k1):
    """LAYOUT='planes' table: the same 4 shifted views stacked as planes
    (4, B*hp*wp, ck)."""
    b = fp.shape[0]
    f = fp[..., k0:k1]
    hp, wp = fp.shape[1] - 1, fp.shape[2] - 1
    return jnp.stack(
        [f[:, :-1, :-1], f[:, :-1, 1:], f[:, 1:, :-1], f[:, 1:, 1:]],
        axis=0,
    ).reshape(4, b * hp * wp, k1 - k0)


def _indices(coords, b, h, w, m, dtype):
    """Flat batched row indices + stacked tap weights, TILE-padded."""
    hp, wp = h + 1, w + 1
    flat, w4 = _quad_idx_weights(coords.reshape(b, -1, 2), h, w, dtype)
    p0 = hp * wp
    idx = (flat + jnp.arange(b, dtype=jnp.int32)[:, None] * p0).reshape(-1)
    # f32 weights: SMEM scalar reads; cast to the data dtype per use so
    # numerics match the previous bf16 VMEM staging exactly
    w4 = jnp.stack(w4, axis=-1).reshape(-1, 4).astype(jnp.float32)
    n = b * m
    n_pad = _round_up(n, TILE)
    if n_pad != n:
        idx = jnp.pad(idx, (0, n_pad - n))
        w4 = jnp.pad(w4, ((0, n_pad - n), (0, 0)))
    return idx, w4, n, n_pad


def _forward(features, coords):
    b, h, w, c = features.shape
    out_shape = coords.shape[:-1] + (c,)
    m = coords.reshape(b, -1, 2).shape[1]
    idx, w4, n, n_pad = _indices(coords, b, h, w, m, features.dtype)

    # lane tiling wants 128-wide quad rows => pad channels to 32-multiples
    # (zero channels, sliced off the output); XLA-supported widths like 48
    # thus work unchanged
    cp = _round_up(c, 32)
    fp = jnp.pad(features,
                 ((0, 0), (1, 1), (1, 1), (0, cp - c)))
    p = b * (h + 1) * (w + 1)
    p_pad = _round_up(p, 16)
    passes = _num_passes(p_pad, cp, features.dtype.itemsize)
    ck = cp // passes

    outs = []
    for k in range(passes):
        if LAYOUT == "planes":
            table = _quad_pass_planes(fp, k * ck, (k + 1) * ck)
            if p_pad != p:
                table = jnp.pad(table, ((0, 0), (0, p_pad - p), (0, 0)))
            outs.append(_gather_combine_planes(idx, table, w4, n_pad, ck))
        else:
            table = _quad_pass(fp, k * ck, (k + 1) * ck)
            if p_pad != p:
                table = jnp.pad(table, ((0, p_pad - p), (0, 0)))
            outs.append(_gather_combine(idx, table, w4, n_pad, ck))
    out = outs[0] if passes == 1 else jnp.concatenate(outs, axis=-1)
    return out[:n, :c].reshape(out_shape)


def _unshift(ct_quad, b, h, w, ck):
    """Adjoint of _quad_pass: route the 4 tap cotangents back onto the
    padded map and crop the pad ring."""
    hp, wp = h + 1, w + 1
    ct_quad = ct_quad.reshape(b, hp, wp, 4 * ck)
    dfp = jnp.zeros((b, h + 2, w + 2, ck), ct_quad.dtype)
    dfp = dfp.at[:, :-1, :-1].add(ct_quad[..., 0 * ck : 1 * ck])
    dfp = dfp.at[:, :-1, 1:].add(ct_quad[..., 1 * ck : 2 * ck])
    dfp = dfp.at[:, 1:, :-1].add(ct_quad[..., 2 * ck : 3 * ck])
    dfp = dfp.at[:, 1:, 1:].add(ct_quad[..., 3 * ck : 4 * ck])
    return dfp[:, 1:-1, 1:-1]


@jax.custom_vjp
def grid_sample_2d_quad_pallas(features, coords):
    """Pallas-kernel grid_sample_2d_quad (see module docstring).

    features: (B, H, W, C); coords: (B, ..., 2) normalized, align_corners.
    Returns coords.shape[:-1] + (C,). d/d(coords) is defined as zero (the
    grid is calibration geometry, not a learned input).
    """
    return _forward(features, coords)


def _fwd(features, coords):
    # zero-sized proxy: carries the (static) feature shape/dtype through the
    # residual pytree at no cost (dtypes/ints aren't valid pytree leaves)
    proxy = jnp.zeros(features.shape[:-1] + (0,), features.dtype)
    return _forward(features, coords), (proxy, coords)


def _bwd(res, ct):
    proxy, coords = res
    b, h, w = proxy.shape[:3]
    dtype = proxy.dtype
    c = ct.shape[-1]
    m = coords.reshape(b, -1, 2).shape[1]
    idx, w4, n, n_pad = _indices(coords, b, h, w, m, dtype)
    cp = _round_up(c, 32)
    ct = ct.astype(dtype).reshape(-1, c)
    ct = jnp.pad(ct, ((0, n_pad - n), (0, cp - c)))

    p = b * (h + 1) * (w + 1)
    p_pad = _round_up(p, 16)
    passes = _num_passes(p_pad, cp, jnp.dtype(dtype).itemsize)
    ck = cp // passes

    parts = []
    for k in range(passes):
        ct_k = ct[:, k * ck : (k + 1) * ck]
        if LAYOUT == "planes":
            ct_planes = _scatter_outer_planes(idx, ct_k, w4, p_pad, ck)
            # planes (4, P, ck) -> rows (P, 4ck) is exactly the per-row
            # tap-block ordering _unshift expects
            ct_quad = jnp.transpose(ct_planes, (1, 0, 2)).reshape(
                p_pad, 4 * ck)
        else:
            ct_quad = _scatter_outer(idx, ct_k, w4, p_pad, ck)
        parts.append(_unshift(ct_quad[:p], b, h, w, ck))
    dfeat = parts[0] if passes == 1 else jnp.concatenate(parts, axis=-1)
    return dfeat[..., :c], jnp.zeros_like(coords)


grid_sample_2d_quad_pallas.defvjp(_fwd, _bwd)
