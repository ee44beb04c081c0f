import time, numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _vod_flagship
model, cfg, batch = _vod_flagship()
variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, False))(batch)
fwd = jax.jit(lambda v, b: model.apply(v, b, False))
p = fwd(variables, batch)
_ = float(jnp.sum(p["cls_preds"]))  # warm
t0=time.perf_counter()
for i in range(5):
    p = fwd(variables, batch)
    _ = float(jnp.sum(p["cls_preds"]))  # force fetch each iter
print("forward fetched s/frame:", (time.perf_counter()-t0)/5)
