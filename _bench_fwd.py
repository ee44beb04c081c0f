import time, numpy as np, jax
from __graft_entry__ import _vod_flagship
model, cfg, batch = _vod_flagship()
variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, False))(batch)
fwd = jax.jit(lambda v, b: model.apply(v, b, False))
p = fwd(variables, batch); jax.block_until_ready(p)
t0=time.perf_counter()
for _ in range(5): p = fwd(variables, batch)
jax.block_until_ready(p)
print("forward s/frame:", (time.perf_counter()-t0)/5)
