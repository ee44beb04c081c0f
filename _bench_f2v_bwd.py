"""Is the f2v backward (scatter-add into the quad map) the training
bottleneck? Times the VJP of the /8-group chain w.r.t. the feature map,
plus a segment-sum reformulation of the same cotangent accumulation.
"""
import time, json
import jax
import jax.numpy as jnp
import numpy as np

from hgsfusion_tpu.ops.grid_sample import grid_sample_2d_quad

B, Y, X, Z = 1, 320, 320, 31
H, W, C, OUT = 65, 242, 192, 128
REPS = 5


def timed(name, fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    print(json.dumps({name: round((time.perf_counter() - t0) / REPS * 1e3, 1)}),
          flush=True)


def main():
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(C, OUT).astype(np.float32) * 0.05, jnp.bfloat16)
    uv = jnp.asarray(rng.uniform(-1, 1, (B, Y, X, Z, 2)).astype(np.float32))
    ct = jnp.asarray(rng.randn(B, Y, X, Z, OUT).astype(np.float32))

    def chain(f):
        s = grid_sample_2d_quad(f, uv)
        return jnp.einsum("byxzc,co->byxzo", s, k,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def fwd(f):
        return chain(f)

    @jax.jit
    def bwd(f, ct):
        _, vjp = jax.vjp(chain, f)
        return vjp(ct)[0]

    timed("f2v8_fwd_ms", fwd, f)
    timed("f2v8_vjp_ms", bwd, f, ct)

    # segment-sum reformulation of the cotangent accumulation: d_quad[p, :]
    # = sum_n w_n ct2[n, :] for idx_n == p, via sort + segment_sum
    hp, wp = H + 1, W + 1
    idx_np = rng.randint(0, hp * wp, Y * X * Z).astype(np.int32)
    idx = jnp.asarray(idx_np)
    w4 = jnp.asarray(rng.rand(Y * X * Z, 4).astype(np.float32), jnp.bfloat16)
    ct2 = jnp.asarray(rng.randn(Y * X * Z, OUT).astype(np.float32),
                      jnp.bfloat16)

    @jax.jit
    def seg_scatter(idx, w4, ct2):
        upd = (ct2[:, None, :] * w4[..., None]).reshape(-1, 4 * OUT)
        return jax.ops.segment_sum(upd, idx, num_segments=hp * wp)

    @jax.jit
    def seg_sorted(idx, w4, ct2):
        order = jnp.argsort(idx)
        upd = (ct2[:, None, :] * w4[..., None]).reshape(-1, 4 * OUT)[order]
        return jax.ops.segment_sum(
            upd, idx[order], num_segments=hp * wp,
            indices_are_sorted=True)

    timed("ct_accum_segment_ms", seg_scatter, idx, w4, ct2)
    timed("ct_accum_sorted_segment_ms", seg_sorted, idx, w4, ct2)


if __name__ == "__main__":
    main()
