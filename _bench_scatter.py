"""f2v backward-scatter experiments (VERDICT r1 #10).

The f2v cotangent accumulation scatters 3.17 M weighted rows into the
per-group quad maps. Round 1 measured 30.8 ns/row at 1536 B rows and
concluded a per-update floor. This measures:
 1. row-width scaling (192 B..1536 B, bf16 + f32) — if flat, an
    int8-compressed cotangent payload cannot help by construction
    (int8 also needs an int32/f32 accumulator to avoid saturation);
 2. the /4-group VJP (only /8 was profiled in round 1) to complete the
    training-step profile;
 3. K-way sharded scatter (split updates into K independent scatters into
    K map copies, then tree-add) — tests whether XLA pipelines independent
    scatters on one core.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 320 * 320 * 31          # 3.17 M sample rows
ROWS_Q8 = (65 + 1) * (242 + 1)   # /8 padded quad map rows (~16 k)
ROWS_Q4 = (129 + 1) * (484 + 1)  # /4 padded quad map rows (~63 k)
REPS = 10


def timed(name, fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: {dt * 1e3:.1f} ms  ({dt / N * 1e9:.1f} ns/row)",
          flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, ROWS_Q8, N, dtype=np.int32))

    print("== 1. bare scatter-add row-width scaling (3.17M rows -> 16k) ==")
    for ch, dt_ in ((96, jnp.bfloat16), (192, jnp.bfloat16),
                    (384, jnp.bfloat16), (768, jnp.bfloat16)):
        upd = jnp.asarray(
            rng.randn(N, ch).astype(np.float32)).astype(dt_)

        @jax.jit
        def scat(u, i, ch=ch, dt_=dt_):
            return jnp.zeros((ROWS_Q8, ch), dt_).at[i].add(u)

        timed(f"scatter {ch}ch {dt_.__name__} ({ch * dt_.dtype.itemsize}B)",
              scat, upd, idx)
        del upd

    print("== 3. K-way sharded scatter (768ch bf16) ==")
    upd = jnp.asarray(rng.randn(N, 768).astype(np.float32)).astype(jnp.bfloat16)
    for k in (2, 4):
        nk = N // k

        @jax.jit
        def scat_k(u, i, k=k, nk=nk):
            maps = [
                jnp.zeros((ROWS_Q8, 768), jnp.bfloat16)
                .at[i[j * nk:(j + 1) * nk]]
                .add(u[j * nk:(j + 1) * nk])
                for j in range(k)
            ]
            out = maps[0]
            for m in maps[1:]:
                out = out + m
            return out

        timed(f"sharded x{k}", scat_k, upd, idx)
    del upd

    print("== 2. per-group f2v VJP split (full chain fwd+bwd) ==")
    from hgsfusion_tpu.ops.grid_sample import grid_sample_2d_quad

    for tag, (h, w, ch) in (("g4 64ch 129x484", (129, 484, 64)),
                            ("g8 192ch 65x242", (65, 242, 192))):
        f = jnp.asarray(rng.randn(1, h, w, ch).astype(np.float32)).astype(
            jnp.bfloat16)
        coords = jnp.asarray(
            rng.uniform(-1, 1, (1, N, 2)).astype(np.float32))
        ct = jnp.asarray(rng.randn(1, N, ch).astype(np.float32)).astype(
            jnp.bfloat16)

        @jax.jit
        def vjp_full(f, coords, ct):
            _, vjp = jax.vjp(lambda ff: grid_sample_2d_quad(ff, coords), f)
            return vjp(ct)[0]

        timed(f"{tag} VJP", vjp_full, f, coords, ct)


if __name__ == "__main__":
    main()
