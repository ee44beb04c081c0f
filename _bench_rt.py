import time, numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _vod_flagship
model, cfg, batch = _vod_flagship()
variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, False))(batch)
fwd = jax.jit(lambda v, b: model.apply(v, b, False))
p = fwd(variables, batch); _ = float(jnp.sum(p["cls_preds"]))
# measure tunnel roundtrip with a trivial fetch
t0=time.perf_counter()
for _ in range(5): _ = float(jnp.sum(variables["params"]["dense_head"]["conv_cls"]["bias"]))
print("trivial fetch RT:", (time.perf_counter()-t0)/5)
# chain 10 forwards, single fetch at the end
t0=time.perf_counter()
for i in range(10):
    p = fwd(variables, batch)
_ = float(jnp.sum(p["cls_preds"]))
print("10x fwd + 1 fetch, s/frame:", (time.perf_counter()-t0)/10)
