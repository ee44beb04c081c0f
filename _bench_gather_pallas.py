"""Round-2 avenue: Pallas VMEM-resident gather + fused 4-tap combine.

The f2v forward gathers ~3.17 M rows per group from the quad source maps
(g4: 63 k rows x 512 B, g8: 16 k rows x 1536 B) and then does a 4-tap
weighted combine + reduce einsum. XLA's measured gather floor is
~5.9 ns/row at 1536 B rows (~260 GB/s) and the gather output round-trips
HBM before the combine (g4 chain 27 ms, g8 chain 43 ms). Hypotheses:

  (a) with the table resident in VMEM, a per-row dynamic-slice loop reads
      rows at VMEM rate, beating the HBM gather floor;
  (b) fusing the 4-tap weighted combine into the kernel removes the
      3.17 M x row intermediate entirely (output is c/4 per row);
  (c) Mosaic's vmem_limit_bytes param determines whether the real tables
      (32 MB / 24 MB) fit whole or need channel-split passes.

Compares against the XLA take+combine baseline on identical data
(bench.py protocol: chained iterations, one scalar fetch).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 3_174_400      # queries per group (320*320*31)
TILE = 2048
N_PAD = ((N + TILE - 1) // TILE) * TILE
ITERS = 8
VMEM_LIMIT = 100 * 1024 * 1024

# (name, table rows, quad-row channels): real flagship shapes (+pad to 16)
CASES = [
    ("g8", 16048, 768),     # (66*243=16038) x 4*192ch = 24 MB bf16
    ("g4", 63056, 256),     # (130*485=63050) x 4*64ch = 32 MB bf16
    ("g8/2", 16048, 384),   # g8 channel-split pass (12 MB)
    ("g4/2", 63056, 128),   # g4 channel-split pass (16 MB)
]


def make_inputs(p, cq):
    """Locally-clustered indices like the real voxel->image order."""
    rng = np.random.RandomState(0)
    win = min(2048, p)
    base = rng.randint(0, p - win + 1, size=(N_PAD // TILE, 1))
    jitter = rng.randint(0, win, size=(N_PAD // TILE, TILE))
    idx = (base + jitter).reshape(-1).astype(np.int32)
    table = rng.randn(p, cq).astype(jnp.bfloat16)
    w4 = rng.rand(N_PAD, 4).astype(np.float32)
    return jnp.asarray(idx), jnp.asarray(table), jnp.asarray(w4)


def xla_gather_combine(idx, table, w4, cq):
    c = cq // 4
    # w4 arrives f32 (SMEM scalar reads for the pallas kernels); the
    # production XLA path combines with table-dtype weights
    # (grid_sample._quad_idx_weights(dtype)), so cast here — otherwise the
    # baseline promotes the whole combine chain to f32 and the comparison
    # is apples-to-oranges (ADVICE r3 medium).
    w4 = w4.astype(table.dtype)
    rows = jnp.take(table, idx, axis=0)
    return (
        rows[:, 0 * c : 1 * c] * w4[:, 0:1]
        + rows[:, 1 * c : 2 * c] * w4[:, 1:2]
        + rows[:, 2 * c : 3 * c] * w4[:, 2:3]
        + rows[:, 3 * c : 4 * c] * w4[:, 3:4]
    )


def pallas_gather_combine(idx, table, w4, cq, unroll=4):
    """Table VMEM-resident (block index constant -> fetched once); per-row
    dynamic reads + in-register 4-tap combine; only c/4 per row leaves."""
    c = cq // 4
    p = table.shape[0]

    def kernel(idx_ref, table_ref, w_ref, out_ref):
        def body(i, carry):
            for u in range(unroll):
                j = i * unroll + u
                r = idx_ref[j]
                row = table_ref[r, :]
                dt = row.dtype
                out_ref[pl.ds(j, 1), :] = (
                    row[0 * c : 1 * c] * w_ref[j, 0].astype(dt)
                    + row[1 * c : 2 * c] * w_ref[j, 1].astype(dt)
                    + row[2 * c : 3 * c] * w_ref[j, 2].astype(dt)
                    + row[3 * c : 4 * c] * w_ref[j, 3].astype(dt)
                )[None, :]
            return carry

        jax.lax.fori_loop(0, TILE // unroll, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(N_PAD // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((p, cq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_PAD, c), table.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )(idx, table, w4)


def pallas_gather_combine_planes(idx, table4, w4, cq, unroll=4):
    """Plane formulation: table as (4, P, c) — 4 tap planes with normal
    (sublane, lane) tiling — so the combine needs NO lane-dim slicing
    (the 2-D kernel slices rows at c-multiples, which may not lower well
    when c isn't a multiple of 128)."""
    c = cq // 4
    p = table4.shape[1]

    def kernel(idx_ref, table_ref, w_ref, out_ref):
        def body(i, carry):
            for u in range(unroll):
                j = i * unroll + u
                r = idx_ref[j]
                rows = table_ref[:, r, :]  # (4, c)
                dt = rows.dtype
                out_ref[pl.ds(j, 1), :] = (
                    rows[0] * w_ref[j, 0].astype(dt)
                    + rows[1] * w_ref[j, 1].astype(dt)
                    + rows[2] * w_ref[j, 2].astype(dt)
                    + rows[3] * w_ref[j, 3].astype(dt)
                )[None, :]
            return carry

        jax.lax.fori_loop(0, TILE // unroll, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(N_PAD // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((4, p, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_PAD, c), table4.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )(idx, table4, w4)


def xla_gather_combine_matmul(idx, table, w4, kmat, cq):
    """The full per-group chain as XLA runs it: gather + tap combine +
    reduce einsum (kernel rows cg -> 128)."""
    return xla_gather_combine(idx, table, w4, cq) @ kmat


def pallas_gather_combine_matmul(idx, table, w4, kmat, cq, unroll=8):
    """Stage-2 fusion: per-row gather+combine into a VMEM scratch tile,
    then one MXU matmul per tile — only idx/w4 in, 128-ch f32->bf16 rows
    out; the N x cg combined intermediate never exists in HBM."""
    c = cq // 4
    p = table.shape[0]
    ko = kmat.shape[1]

    def kernel(idx_ref, table_ref, w_ref, kmat_ref, out_ref, scratch):
        def body(i, carry):
            for u in range(unroll):
                j = i * unroll + u
                r = idx_ref[j]
                row = table_ref[r, :]
                dt = row.dtype
                scratch[pl.ds(j, 1), :] = (
                    row[0 * c : 1 * c] * w_ref[j, 0].astype(dt)
                    + row[1 * c : 2 * c] * w_ref[j, 1].astype(dt)
                    + row[2 * c : 3 * c] * w_ref[j, 2].astype(dt)
                    + row[3 * c : 4 * c] * w_ref[j, 3].astype(dt)
                )[None, :]
            return carry

        jax.lax.fori_loop(0, TILE // unroll, body, 0)
        out_ref[:] = jnp.dot(
            scratch[:], kmat_ref[:],
            preferred_element_type=jnp.float32).astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(N_PAD // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((p, cq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((c, ko), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, ko), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_PAD, ko), table.dtype),
        scratch_shapes=[pltpu.VMEM((TILE, c), table.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )(idx, table, w4, kmat)


WIN = 2048  # windowed variant: rows per streamed table window


def make_inputs_windowed(p, cq):
    """Indices confined to BLOCK-ALIGNED windows (one per tile) so the
    scalar-prefetch index_map can stream just that window per tile. Models
    the real grid's locality; alignment slack handled in production by an
    XLA correction pass for overflow rows."""
    rng = np.random.RandomState(0)
    nblk = p // WIN
    blk = rng.randint(0, nblk, size=(N_PAD // TILE,)).astype(np.int32)
    jitter = rng.randint(0, WIN, size=(N_PAD // TILE, TILE))
    idx = (blk[:, None] * WIN + jitter).reshape(-1).astype(np.int32)
    table = rng.randn(p, cq).astype(jnp.bfloat16)
    w4 = rng.rand(N_PAD, 4).astype(np.float32)
    return jnp.asarray(blk), jnp.asarray(idx), jnp.asarray(table), \
        jnp.asarray(w4)


def pallas_gather_combine_windowed(blk, idx, table, w4, cq, unroll=8):
    """Table stays in HBM; each tile's window block is fetched by a
    scalar-prefetch-driven index_map (streaming DMA at full HBM rate,
    pipelined by pallas) and rows are read from the window in VMEM."""
    c = cq // 4
    p = table.shape[0]

    def kernel(blk_ref, idx_ref, table_ref, w_ref, out_ref):
        base = blk_ref[pl.program_id(0)] * WIN

        def body(i, carry):
            for u in range(unroll):
                j = i * unroll + u
                r = idx_ref[j] - base
                row = table_ref[r, :]
                dt = row.dtype
                out_ref[pl.ds(j, 1), :] = (
                    row[0 * c : 1 * c] * w_ref[j, 0].astype(dt)
                    + row[1 * c : 2 * c] * w_ref[j, 1].astype(dt)
                    + row[2 * c : 3 * c] * w_ref[j, 2].astype(dt)
                    + row[3 * c : 4 * c] * w_ref[j, 3].astype(dt)
                )[None, :]
            return carry

        jax.lax.fori_loop(0, TILE // unroll, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N_PAD // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i, blk: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((WIN, cq), lambda i, blk: (blk[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda i, blk: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE, c), lambda i, blk: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N_PAD, c), table.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )(blk, idx, table, w4)


def timed(fn, args, iters=ITERS, perturb_arg=0):
    """Chain iters calls, perturbing args[perturb_arg] each time to defeat
    CSE (O(1) edit). The default perturbs the index vector's first entry
    mod 4 (stays in-bounds for every table). Callers whose first arg
    carries an addressing INVARIANT (e.g. the windowed kernel's per-tile
    window ids, which idx offsets are derived from) must instead point
    perturb_arg at a value-only input such as the combine weights."""
    def chained(*a):
        acc = jnp.zeros((), jnp.float32)
        a = list(a)
        for i in range(iters):
            out = fn(*a)
            # FULL-array reduction: consuming only out[0, 0] lets XLA's
            # slice-sinker shrink the elementwise combine to ~one row for
            # the XLA baseline while pallas_call stays opaque — an
            # asymmetric comparison. sum(out) forces materialization for
            # every variant at identical (~ms-level) cost.
            acc = acc + jnp.sum(out.astype(jnp.float32))
            x = a[perturb_arg]
            z = (0,) * x.ndim
            a[perturb_arg] = x.at[z].set((x[z] + 1) % 4)
        return acc

    f = jax.jit(chained)
    f(*args).block_until_ready()  # compile
    f(*args).block_until_ready()  # warmup: first post-compile run through
    # the remote-exec tunnel can carry setup cost (r3: g8 read 20 s where
    # every later group read 16-40 ms) — never time the first execution
    t0 = time.perf_counter()
    float(f(*args))
    return (time.perf_counter() - t0) / iters


def main():
    for name, p, cq in CASES:
        idx, table, w4 = make_inputs(p, cq)
        t_x = timed(functools.partial(xla_gather_combine, cq=cq),
                    (idx, table, w4))
        print(f"{name} (P={p} CQ={cq}, {p * cq * 2 / 2**20:.0f} MB): "
              f"XLA gather+combine {t_x * 1e3:8.2f} ms "
              f"({t_x / N_PAD * 1e9:.2f} ns/row)", flush=True)
        for unroll in (4, 8):
            try:
                t_p = timed(
                    functools.partial(pallas_gather_combine, cq=cq,
                                      unroll=unroll), (idx, table, w4))
                print(f"{name}: pallas fused (unroll {unroll}) "
                      f"{t_p * 1e3:8.2f} ms ({t_p / N_PAD * 1e9:.2f} ns/row)",
                      flush=True)
            except Exception as e:
                msg = str(e).splitlines()[0][:200]
                print(f"{name}: pallas unroll {unroll} FAILED: {msg}",
                      flush=True)
        c = cq // 4
        kmat = jnp.asarray(
            np.random.RandomState(2).randn(c, 128).astype(jnp.bfloat16))
        t_xm = timed(functools.partial(xla_gather_combine_matmul, cq=cq),
                     (idx, table, w4, kmat))
        print(f"{name}: XLA chain+matmul   {t_xm * 1e3:8.2f} ms "
              f"({t_xm / N_PAD * 1e9:.2f} ns/row)", flush=True)
        try:
            t_pm = timed(
                functools.partial(pallas_gather_combine_matmul, cq=cq),
                (idx, table, w4, kmat))
            print(f"{name}: pallas fused+matmul {t_pm * 1e3:8.2f} ms "
                  f"({t_pm / N_PAD * 1e9:.2f} ns/row)", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:200]
            print(f"{name}: pallas fused+matmul FAILED: {msg}", flush=True)
        blkw, idxw, tablew, w4w = make_inputs_windowed(p, cq)
        try:
            # perturb w4 (arg 3), NOT blk/idx: the kernel requires
            # idx[i] - blk[tile]*WIN to stay inside [0, WIN)
            t_w = timed(
                lambda blk, *rest: pallas_gather_combine_windowed(
                    blk, *rest, cq=cq), (blkw, idxw, tablew, w4w),
                perturb_arg=3)
            print(f"{name}: pallas windowed    {t_w * 1e3:8.2f} ms "
                  f"({t_w / N_PAD * 1e9:.2f} ns/row) "
                  f"[UPPER BOUND: block-local synthetic indices; the real "
                  f"grid violates the window invariant — not shippable "
                  f"without an overflow pass]", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:200]
            print(f"{name}: pallas windowed FAILED: {msg}", flush=True)
        # PRODUCTION kernels (ops/pallas_sample) on the same inputs: the
        # shipped kernels use fori_loop unroll=1 (Mosaic rejects any other
        # partial unroll); the microbench variants above differ by doing a
        # Python-level manual unroll inside the loop body, so the layout
        # verdict must still be confirmed on the exact code that ships
        try:
            from hgsfusion_tpu.ops import pallas_sample as PS

            t_prod = timed(
                lambda i_, t_, w_: PS._gather_combine(
                    i_, t_, w_.astype(jnp.float32), N_PAD, c),
                (idx, table, w4))
            print(f"{name}: PRODUCTION rows    {t_prod * 1e3:8.2f} ms "
                  f"({t_prod / N_PAD * 1e9:.2f} ns/row)", flush=True)
        except Exception as e:
            print(f"{name}: PRODUCTION rows FAILED: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
        table4 = jnp.transpose(table.reshape(p, 4, c), (1, 0, 2))
        try:
            from hgsfusion_tpu.ops import pallas_sample as PS

            t_prod4 = timed(
                lambda i_, t_, w_: PS._gather_combine_planes(
                    i_, t_, w_.astype(jnp.float32), N_PAD, c),
                (idx, table4, w4))
            print(f"{name}: PRODUCTION planes  {t_prod4 * 1e3:8.2f} ms "
                  f"({t_prod4 / N_PAD * 1e9:.2f} ns/row)", flush=True)
        except Exception as e:
            print(f"{name}: PRODUCTION planes FAILED: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
        for unroll in (4, 8):
            try:
                t_p = timed(
                    functools.partial(pallas_gather_combine_planes, cq=cq,
                                      unroll=unroll), (idx, table4, w4))
                print(f"{name}: pallas planes (unroll {unroll}) "
                      f"{t_p * 1e3:8.2f} ms ({t_p / N_PAD * 1e9:.2f} ns/row)",
                      flush=True)
            except Exception as e:
                msg = str(e).splitlines()[0][:200]
                print(f"{name}: pallas planes unroll {unroll} FAILED: {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
