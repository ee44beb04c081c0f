"""Train-step time with the Pallas f2v sampler (VERDICT r1 #10 follow-up).

Same protocol as _bench_train2.py (chained steps, one scalar fetch),
config switched to configs/hgsfusion_vod_pallas.yaml so the f2v backward
runs the fused outer-product VMEM-accumulator scatter instead of XLA's
31.9 ns/row HBM scatter-add. Compare against the 550 ms/step baseline
(BASELINE.md training profile). Run on a QUIET chip.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _vod_flagship
from hgsfusion_tpu.models.anchors import TargetAssigner
from hgsfusion_tpu.config import load_config
from hgsfusion_tpu.train.optim import build_optimizer
from hgsfusion_tpu.train.trainer import TrainState, make_train_step

CFG = "configs/hgsfusion_vod_pallas.yaml"

model, cfg, batch = _vod_flagship(config_path=CFG)
rng = np.random.RandomState(0)
gt = np.zeros((1, 64, 8), np.float32)
gt[0, :10, :7] = np.concatenate([
    rng.uniform(5, 45, (10, 1)), rng.uniform(-20, 20, (10, 1)),
    rng.uniform(-1.5, 0, (10, 1)), np.tile([3.9, 1.6, 1.56], (10, 1)),
    rng.uniform(-3, 3, (10, 1))], axis=1)
gt[0, :10, 7] = 1
batch = dict(batch)
batch["gt_boxes"] = jnp.asarray(gt)

yaml_cfg = load_config(CFG)
anchor_cfg = [dict(c) for c in yaml_cfg.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG]
assigner = TargetAssigner(anchor_cfg, cfg.grid_size, cfg.pc_range,
                          class_names=cfg.class_names)
variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, True))(batch)
params, bstats = variables["params"], variables["batch_stats"]
tx, _ = build_optimizer(yaml_cfg.OPTIMIZATION, 1000, params)
loss_weights = dict(yaml_cfg.MODEL.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS)
step_fn = jax.jit(make_train_step(model, assigner, tx, loss_weights, cfg))
state = TrainState(params=params, batch_stats=bstats,
                   opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))

print("compiling train step (pallas f2v)...", flush=True)
state, metrics = step_fn(state, batch)
_ = float(metrics["loss"])
print(f"first step done, loss={float(metrics['loss']):.4f}", flush=True)

ITERS = 10
for trial in range(3):
    t0 = time.perf_counter()
    s = state
    for _ in range(ITERS):
        s, metrics = step_fn(s, batch)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"trial {trial}: {dt * 1e3:.1f} ms/step "
          f"(loss={float(metrics['loss']):.4f})", flush=True)
