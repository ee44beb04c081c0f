"""Stage-by-stage breakdown of the f2v chain (real shapes, /8 group)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, Y, X, Z = 1, 320, 320, 31
N = Y * X * Z
H, W, C = 65, 242, 192
OUT = 128
REPS = 10


def timed(name, fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: {dt * 1e3:.1f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(C, OUT).astype(np.float32) * 0.05, jnp.bfloat16)
    uv = jnp.asarray(rng.uniform(-1, 1, (B, Y, X, Z, 2)).astype(np.float32))

    hp, wp = H + 1, W + 1

    def build_quad(f):
        fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return jnp.concatenate(
            [fp[:, :-1, :-1], fp[:, :-1, 1:], fp[:, 1:, :-1], fp[:, 1:, 1:]],
            axis=-1).reshape(B, hp * wp, 4 * C)

    def idx_w(uv):
        ix = (uv[..., 0] + 1) * 0.5 * (W - 1)
        iy = (uv[..., 1] + 1) * 0.5 * (H - 1)
        ix0, iy0 = jnp.floor(ix), jnp.floor(iy)
        tx = (ix - ix0).astype(jnp.bfloat16)
        ty = (iy - iy0).astype(jnp.bfloat16)
        inb = lambda v, n: ((v >= 0) & (v <= n - 1)).astype(jnp.bfloat16)
        mx0, mx1 = inb(ix0, W), inb(ix0 + 1, W)
        my0, my1 = inb(iy0, H), inb(iy0 + 1, H)
        xp = jnp.clip(ix0 + 1, 0, wp - 1).astype(jnp.int32)
        yp = jnp.clip(iy0 + 1, 0, hp - 1).astype(jnp.int32)
        flat = (yp * wp + xp).reshape(B, -1)
        w4 = jnp.stack([
            (1 - tx) * (1 - ty) * mx0 * my0, tx * (1 - ty) * mx1 * my0,
            (1 - tx) * ty * mx0 * my1, tx * ty * mx1 * my1], axis=-1
        ).reshape(B, -1, 4)
        return flat, w4

    @jax.jit
    def s1_quad(f):
        return jnp.sum(build_quad(f), axis=1)

    @jax.jit
    def s2_gather(f, uv):
        quad = build_quad(f)
        flat, _ = idx_w(uv)
        rows = jnp.take_along_axis(quad, flat[..., None], axis=1)
        return jnp.sum(rows, axis=1)

    @jax.jit
    def s3_combine(f, uv):
        quad = build_quad(f)
        flat, w4 = idx_w(uv)
        rows = jnp.take_along_axis(quad, flat[..., None], axis=1)
        rows = rows.reshape(B, -1, 4, C)
        return jnp.sum(rows * w4[..., None], axis=2)  # (B, N, C)

    @jax.jit
    def s4_full(f, k, uv):
        quad = build_quad(f)
        flat, w4 = idx_w(uv)
        rows = jnp.take_along_axis(quad, flat[..., None], axis=1)
        rows = rows.reshape(B, -1, 4, C)
        s = jnp.sum(rows * w4[..., None], axis=2)
        return jnp.einsum("bnc,co->bno", s, k,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def s4b_scale_then_mm(f, k, uv):
        # weights applied to rows, then ONE (N,4C)@(4C,OUT) matmul
        quad = build_quad(f)
        flat, w4 = idx_w(uv)
        rows = jnp.take_along_axis(quad, flat[..., None], axis=1)
        rows = (rows.reshape(B, -1, 4, C)
                * w4[..., None]).reshape(B, -1, 4 * C)
        k4 = jnp.concatenate([k, k, k, k], axis=0)  # (4C, OUT)
        return jnp.einsum("bnc,co->bno", rows, k4,
                          preferred_element_type=jnp.float32)

    timed("s1 quad build only", s1_quad, f)
    timed("s2 + gather", s2_gather, f, uv)
    timed("s3 + 4-tap combine", s3_combine, f, uv)
    timed("s4 + einsum (chain A 1-group)", s4_full, f, k, uv)
    timed("s4b scale-rows + single 4C matmul", s4b_scale_then_mm, f, k, uv)


if __name__ == "__main__":
    main()
