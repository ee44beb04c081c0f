"""int8-quantized f2v gather payload vs bf16 (VERDICT r1 #2).

Times the full per-group chain (quad build + gather + 4-tap combine +
channel-reduce einsum) at real VoD flagship shapes for both scale groups:
/4 group 64ch (129x484) and /8 group 192ch (65x242), N = 320*320*31 samples.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, Y, X, Z = 1, 320, 320, 31
N = Y * X * Z
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


def chain_bf16(f, k, uv):
    from hgsfusion_tpu.ops.grid_sample import grid_sample_2d_quad

    s = grid_sample_2d_quad(f.astype(jnp.bfloat16), uv)
    return jnp.einsum("bnc,co->bno", s, k.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


def chain_q8(f, k, uv):
    from hgsfusion_tpu.ops.grid_sample import grid_sample_2d_quad_q8

    s, scale = grid_sample_2d_quad_q8(f, uv, jnp.bfloat16)
    ks = (k * scale[:, None]).astype(jnp.bfloat16)
    return jnp.einsum("bnc,co->bno", s, ks,
                      preferred_element_type=jnp.float32)


def main():
    rng = np.random.RandomState(0)
    uv = jnp.asarray(rng.uniform(-1, 1, (B, N, 2)).astype(np.float32))
    total = {}
    for name, (h, w, c) in {
        "g4 64ch 129x484": (129, 484, 64),
        "g8 192ch 65x242": (65, 242, 192),
    }.items():
        f = jnp.asarray(rng.randn(B, h, w, c).astype(np.float32))
        k = jnp.asarray(rng.randn(c, OUT).astype(np.float32) * 0.05)
        a = timed(f"{name} bf16 chain", jax.jit(chain_bf16), f, k, uv)
        b = timed(f"{name} q8  chain", jax.jit(chain_q8), f, k, uv)
        total["bf16"] = total.get("bf16", 0) + a
        total["q8"] = total.get("q8", 0) + b
    print(f"TOTAL bf16 {total['bf16']*1e3:.1f} ms  "
          f"q8 {total['q8']*1e3:.1f} ms  "
          f"speedup {total['bf16']/total['q8']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
