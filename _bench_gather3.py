"""Gather-floor microbenchmarks for the f2v redesign (run on the TPU chip).

Questions:
  1. per-row cost vs row width (256B / 512B / 1.5KB / 3KB)
  2. traced indices vs CONSTANT (compile-time) indices
  3. random vs sorted (coherent) indices
  4. blocked one-hot matmul throughput (the static-sparsity alternative):
     out = S (T x P) @ F (P x C) per tile, S built on host
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N_ROWS = 3_170_000  # 320*320*31 samples
REPS = 20


def timed(fn, *args):
    # Chain iterations with ONE final scalar fetch (remote tunnel: block_
    # until_ready returns before execution; see bench.py timing notes).
    out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / REPS


def bench_gather(n_src, row_elems, const_idx, sorted_idx):
    rng = np.random.RandomState(0)
    src = jnp.asarray(
        rng.randn(n_src, row_elems).astype(np.float32), jnp.bfloat16
    )
    idx_np = rng.randint(0, n_src, N_ROWS).astype(np.int32)
    if sorted_idx:
        idx_np = np.sort(idx_np)

    if const_idx:
        idx_const = jnp.asarray(idx_np)

        @jax.jit
        def fn(s):
            return jnp.sum(s[idx_const], axis=0)

        dt = timed(fn, src)
    else:
        idx = jnp.asarray(idx_np)

        @jax.jit
        def fn(s, i):
            return jnp.sum(s[i], axis=0)

        dt = timed(fn, src, idx)
    ns_row = dt / N_ROWS * 1e9
    gbps = N_ROWS * row_elems * 2 / dt / 1e9
    print(
        f"gather rows={N_ROWS} src={n_src} width={row_elems * 2}B "
        f"const={const_idx} sorted={sorted_idx}: {dt * 1e3:.2f} ms "
        f"({ns_row:.2f} ns/row, {gbps:.0f} GB/s)",
        flush=True,
    )
    return dt


def bench_onehot_matmul(n_tiles, t_per_tile, p, c):
    rng = np.random.RandomState(0)
    s = jnp.asarray(
        rng.randn(n_tiles, t_per_tile, p).astype(np.float32), jnp.bfloat16
    )
    f = jnp.asarray(rng.randn(n_tiles, p, c).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def fn(a, b):
        return jnp.einsum("ntp,npc->ntc", a, b)

    dt = timed(fn, s, f)
    flops = 2 * n_tiles * t_per_tile * p * c
    print(
        f"blockmm tiles={n_tiles} T={t_per_tile} P={p} C={c}: "
        f"{dt * 1e3:.2f} ms ({flops / dt / 1e12:.1f} TFLOP/s)",
        flush=True,
    )
    return dt


def bench_onehot_build(n_tiles, t_per_tile, p):
    """Cost of building S on device from compact (idx, weight) tap lists."""
    rng = np.random.RandomState(0)
    tap_idx = jnp.asarray(
        rng.randint(0, p, (n_tiles, t_per_tile, 4)).astype(np.int32)
    )
    tap_w = jnp.asarray(
        rng.rand(n_tiles, t_per_tile, 4).astype(np.float32), jnp.bfloat16
    )

    @jax.jit
    def fn(ti, tw):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, p), 3)
        onehot = (ti[..., None] == iota).astype(jnp.bfloat16)
        return jnp.sum(onehot * tw[..., None], axis=2)  # (n, T, P)

    dt = timed(fn, tap_idx, tap_w)
    print(
        f"onehot-build tiles={n_tiles} T={t_per_tile} P={p}: "
        f"{dt * 1e3:.2f} ms",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    # image-map-sized sources: /8 map 65*242=15.7k rows; quad-canvas 4x width
    for width in (128, 256, 768):
        for const in (False, True):
            bench_gather(15_730, width, const, False)
        bench_gather(15_730, width, True, True)
    # blocked matmul alternative: ~3.17M samples total in tiles
    n_tiles = N_ROWS // 2048
    for p in (256, 512, 1024):
        bench_onehot_matmul(n_tiles, 2048, p, 192)
        bench_onehot_build(n_tiles, 2048, p)
