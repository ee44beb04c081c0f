import time, numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _vod_flagship
model, cfg, batch = _vod_flagship()
variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, False))(batch)
fwd = jax.jit(lambda v, b: model.apply(v, b, False))
# vary inputs each iteration to defeat any result memoization
imgs = [batch["images"] + 0.001*i for i in range(6)]
p = fwd(variables, batch); jax.block_until_ready(p)
t0=time.perf_counter()
for i in range(5):
    b2 = dict(batch); b2["images"] = imgs[i+1]
    p = fwd(variables, b2)
jax.block_until_ready(p)
print("forward varied s/frame:", (time.perf_counter()-t0)/5)
t0=time.perf_counter()
for i in range(5):
    p = fwd(variables, batch)
jax.block_until_ready(p)
print("forward identical s/frame:", (time.perf_counter()-t0)/5)
