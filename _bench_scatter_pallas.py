"""VERDICT r1 #10 remaining avenue: Pallas VMEM-accumulator scatter-add.

The f2v training backward scatters ~3.17 M cotangent rows into the quad
source maps (g8: 16 k x 1536 B, g4: 63 k x 512 B); XLA's scatter-add
measured 31.9 ns/row (1536 B rows) — ~50 GB/s, far below both HBM stream
rate and the 259 GB/s gather floor. Hypotheses:

  (a) holding the table as a VMEM accumulator and streaming update tiles
      through a per-row dynamic accumulate loop beats the XLA scatter
      because the read-modify-write hits VMEM instead of HBM;
  (b) building the 4c-wide update row IN-REGISTER from (ct c-row, w4)
      — the outer-product form the real backward needs — additionally
      removes the 3.17 M x 4c materialized update array from HBM.

Run on a QUIET chip (bench.py protocol: chained iterations, fetch one
scalar). Compares against XLA .at[idx].add baselines on identical data.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 3_174_400
TILE = 2048
N_PAD = ((N + TILE - 1) // TILE) * TILE
ITERS = 8
VMEM_LIMIT = 100 * 1024 * 1024

CASES = [
    ("g8", 16048, 768),     # 24 MB bf16 accumulator
    ("g4", 63056, 256),     # 32 MB
    ("g8/2", 16048, 384),   # channel-split halves
    ("g4/2", 63056, 128),
]


def make_inputs(p, cq):
    # f32 generation: rng.randn would materialize an 18 GB float64
    # (N_PAD, 768) intermediate before the bf16 cast and can OOM the host
    # before the first measurement
    rng = np.random.default_rng(0)
    win = min(2048, p)
    base = rng.integers(0, p - win + 1, size=(N_PAD // TILE, 1))
    jitter = rng.integers(0, win, size=(N_PAD // TILE, TILE))
    idx = (base + jitter).reshape(-1).astype(np.int32)
    upd = rng.standard_normal((N_PAD, cq), dtype=np.float32).astype(
        jnp.bfloat16)
    ct = rng.standard_normal((N_PAD, cq // 4), dtype=np.float32).astype(
        jnp.bfloat16)
    w4 = rng.random((N_PAD, 4), dtype=np.float32).astype(jnp.bfloat16)
    return jnp.asarray(idx), jnp.asarray(upd), jnp.asarray(ct), jnp.asarray(w4)


def xla_scatter(idx, upd, p, cq):
    return jnp.zeros((p, cq), jnp.bfloat16).at[idx].add(upd)


def xla_scatter_outer(idx, ct, w4, p, cq):
    """XLA baseline for the real backward: build rows by outer product,
    then scatter-add (what the current VJP does, fused or not by XLA)."""
    rows = (w4[:, :, None] * ct[:, None, :]).reshape(ct.shape[0], cq)
    return jnp.zeros((p, cq), jnp.bfloat16).at[idx].add(rows)


def pallas_scatter(idx, upd, p, cq, unroll=1):
    def kernel(idx_ref, upd_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, carry):
            for u in range(unroll):
                j = i * unroll + u
                r = idx_ref[j]
                out_ref[pl.ds(r, 1), :] += upd_ref[pl.ds(j, 1), :]
            return carry

        jax.lax.fori_loop(0, TILE // unroll, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(N_PAD // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, cq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p, cq), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, cq), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )(idx, upd)


def pallas_scatter_outer(idx, ct, w4, p, cq, unroll=1):
    """Fused: update row built in-register as [w0*ct | w1*ct | w2*ct | w3*ct]
    (the rank-1 quad cotangent), accumulated into the VMEM table."""
    c = cq // 4

    def kernel(idx_ref, ct_ref, w_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, carry):
            for u in range(unroll):
                j = i * unroll + u
                r = idx_ref[j]
                g = ct_ref[pl.ds(j, 1), :]
                w = w_ref[pl.ds(j, 1), :]
                row = jnp.concatenate(
                    [g * w[0, 0], g * w[0, 1], g * w[0, 2], g * w[0, 3]],
                    axis=-1)
                out_ref[pl.ds(r, 1), :] += row
            return carry

        jax.lax.fori_loop(0, TILE // unroll, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(N_PAD // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p, cq), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, cq), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )(idx, ct, w4)


def timed(fn, args, iters=ITERS):
    def chained(*a):
        acc = jnp.zeros((), jnp.float32)
        idx = a[0]
        for i in range(iters):
            out = fn(idx, *a[1:])
            acc = acc + jnp.sum(out.astype(jnp.float32))  # full materialization
            idx = idx.at[0].set((idx[0] + 1) % 8)  # defeat CSE, O(1)
        return acc

    f = jax.jit(chained)
    f(*args).block_until_ready()
    t0 = time.perf_counter()
    float(f(*args))
    return (time.perf_counter() - t0) / iters


def main():
    for name, p, cq in CASES:
        idx, upd, ct, w4 = make_inputs(p, cq)
        t_x = timed(functools.partial(xla_scatter, p=p, cq=cq), (idx, upd))
        print(f"{name} (P={p} CQ={cq}): XLA scatter-add "
              f"{t_x * 1e3:8.2f} ms ({t_x / N_PAD * 1e9:.1f} ns/row)",
              flush=True)
        t_xo = timed(functools.partial(xla_scatter_outer, p=p, cq=cq),
                     (idx, ct, w4))
        print(f"{name}: XLA outer+scatter  {t_xo * 1e3:8.2f} ms "
              f"({t_xo / N_PAD * 1e9:.1f} ns/row)", flush=True)
        # PRODUCTION backward kernels on the same inputs (the shipped
        # fori_loop unroll=8 bodies, both layouts)
        try:
            from hgsfusion_tpu.ops import pallas_sample as PS

            t_pr = timed(
                lambda i_, c_, w_: PS._scatter_outer(
                    i_, c_, w_.astype(jnp.float32), p, cq // 4),
                (idx, ct, w4))
            print(f"{name}: PRODUCTION rows    {t_pr * 1e3:8.2f} ms "
                  f"({t_pr / N_PAD * 1e9:.1f} ns/row)", flush=True)
        except Exception as e:
            print(f"{name}: PRODUCTION rows FAILED: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
        try:
            from hgsfusion_tpu.ops import pallas_sample as PS

            t_pp = timed(
                lambda i_, c_, w_: PS._scatter_outer_planes(
                    i_, c_, w_.astype(jnp.float32), p, cq // 4),
                (idx, ct, w4))
            print(f"{name}: PRODUCTION planes  {t_pp * 1e3:8.2f} ms "
                  f"({t_pp / N_PAD * 1e9:.1f} ns/row)", flush=True)
        except Exception as e:
            print(f"{name}: PRODUCTION planes FAILED: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
        for fn, tag in ((pallas_scatter, "premat"),
                        (pallas_scatter_outer, "outer ")):
            args = (idx, upd) if tag == "premat" else (idx, ct, w4)
            for unroll in (1, 4):
                try:
                    t_p = timed(functools.partial(fn, p=p, cq=cq,
                                                  unroll=unroll), args)
                    print(f"{name}: pallas {tag} (unroll {unroll}) "
                          f"{t_p * 1e3:8.2f} ms "
                          f"({t_p / N_PAD * 1e9:.1f} ns/row)", flush=True)
                except Exception as e:
                    msg = str(e).splitlines()[0][:200]
                    print(f"{name}: pallas {tag} unroll {unroll} FAILED: "
                          f"{msg}", flush=True)


if __name__ == "__main__":
    main()
