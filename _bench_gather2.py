import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.RandomState(0)
def timed(name, fn, *args, iters=5):
    out = fn(*args); _ = float(jnp.sum(out[:4, :4].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    _ = float(jnp.sum(out[:4, :4].astype(jnp.float32)))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.1f} ms", flush=True)

for n_rows, c in [(3174400, 64), (3174400, 256), (1587200, 512), (793600, 1024)]:
    tab = jnp.asarray(rng.randn(62436, c).astype(np.float32)).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, 62436, n_rows).astype(np.int32))
    f = jax.jit(lambda t, i: jnp.take_along_axis(t, i[:, None], axis=0))
    timed(f"gather {n_rows} rows x {c}ch ({n_rows*c*2//2**20}MB)", f, tab, idx)
