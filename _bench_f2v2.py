"""A/B benchmark: current f2v chain vs pre-projected sampling (real shapes).

A (shipped): per group quad-gather -> 4-tap combine -> einsum Cg->128, sum.
B (candidate): project each map to 128ch FIRST (linear commutes with
   bilinear sampling), then quad-gather 128ch rows and just add groups.
Both produce (B, Y, X, Z, 128); numerically equal up to fp reassociation.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from hgsfusion_tpu.ops.grid_sample import grid_sample_2d_quad

B, Y, X, Z = 1, 320, 320, 31
SHAPES = [((129, 484), 64), ((65, 242), 192)]  # /4 group, /8 packed group
OUT = 128
REPS = 10


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


def main():
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(B, h, w, c).astype(np.float32), jnp.bfloat16)
        for (h, w), c in SHAPES
    ]
    kernels = [
        jnp.asarray(rng.randn(c, OUT).astype(np.float32) * 0.05, jnp.bfloat16)
        for (_, c) in SHAPES
    ]
    uv = jnp.asarray(
        rng.uniform(-1, 1, (B, Y, X, Z, 2)).astype(np.float32)
    )

    @jax.jit
    def chain_a(f1, f2, k1, k2, uv):
        vox = jnp.zeros((B, Y, X, Z, OUT), jnp.float32)
        for f, k in ((f1, k1), (f2, k2)):
            s = grid_sample_2d_quad(f, uv)
            vox = vox + jnp.einsum(
                "byxzc,co->byxzo", s, k,
                preferred_element_type=jnp.float32,
            )
        return jax.nn.relu(vox.astype(jnp.bfloat16))

    @jax.jit
    def chain_b(f1, f2, k1, k2, uv):
        vox = jnp.zeros((B, Y, X, Z, OUT), jnp.float32)
        for f, k in ((f1, k1), (f2, k2)):
            fp = jnp.einsum(
                "bhwc,co->bhwo", f, k, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
            vox = vox + grid_sample_2d_quad(fp, uv).astype(jnp.float32)
        return jax.nn.relu(vox.astype(jnp.bfloat16))

    dt_a = timed(chain_a, *feats, *kernels, uv)
    print(f"A shipped (sample->einsum): {dt_a * 1e3:.1f} ms", flush=True)
    dt_b = timed(chain_b, *feats, *kernels, uv)
    print(f"B pre-projected sampling:  {dt_b * 1e3:.1f} ms", flush=True)

    oa = chain_a(*feats, *kernels, uv)
    ob = chain_b(*feats, *kernels, uv)
    err = float(jnp.max(jnp.abs(oa.astype(jnp.float32) - ob.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(oa.astype(jnp.float32))))
    print(f"max |A-B| = {err:.4f} (scale {scale:.2f})", flush=True)


if __name__ == "__main__":
    main()
