"""Train-step decomposition: where do the 550 ms go?

Times (chained, one scalar fetch): loss forward only; grad; grad with
stop_gradient after the frustum transform (isolates the f2v backward
scatter); full step (grad + clip + optimizer).
"""
import time, json
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _vod_flagship
from hgsfusion_tpu.models.anchors import TargetAssigner
from hgsfusion_tpu.config import load_config, ConfigDict
from hgsfusion_tpu.train.optim import build_optimizer
from hgsfusion_tpu.train.trainer import TrainState, make_train_step, model_inputs
from hgsfusion_tpu.models.anchor_head import anchor_head_loss
from hgsfusion_tpu.models.occupancy import occupancy_loss

model, cfg, batch = _vod_flagship()
rng = np.random.RandomState(0)
gt = np.zeros((1, 64, 8), np.float32)
gt[0, :10, :7] = np.concatenate([
    rng.uniform(5, 45, (10, 1)), rng.uniform(-20, 20, (10, 1)),
    rng.uniform(-1.5, 0, (10, 1)), np.tile([3.9, 1.6, 1.56], (10, 1)),
    rng.uniform(-3, 3, (10, 1))], axis=1)
gt[0, :10, 7] = 1
batch = dict(batch); batch["gt_boxes"] = jnp.asarray(gt)

yaml_cfg = load_config("configs/hgsfusion_vod.yaml")
assigner = TargetAssigner(
    [dict(c) for c in yaml_cfg.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG],
    cfg.grid_size, cfg.pc_range, class_names=cfg.class_names)
variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, False))(batch)
lw = {"cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
      "code_weights": [1.0] * 7}
anchors = assigner.flat_anchors

def loss_fn(params, batch_stats, batch):
    preds, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        model_inputs(batch), True, mutable=["batch_stats"],
    )
    targets = assigner(batch["gt_boxes"])
    rpn_loss, tb = anchor_head_loss(
        preds, targets, anchors, cfg.num_class, lw,
        dir_offset=cfg.dir_offset, num_dir_bins=cfg.num_dir_bins,
    )
    occ = occupancy_loss(
        preds["occupancy"], batch["gt_boxes"], cfg.grid_size,
        cfg.pc_range, cfg.voxel_size, 32,
    )
    return rpn_loss + occ, (tb, mutated["batch_stats"])

params = variables["params"]
bstats = variables["batch_stats"]

def timed(name, fn, *args):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / 5
    print(json.dumps({name: round(dt * 1000, 1)}), flush=True)

@jax.jit
def fwd_only(params, bstats, batch):
    loss, aux = loss_fn(params, bstats, batch)
    return loss

@jax.jit
def grad_fn(params, bstats, batch):
    g = jax.grad(lambda p: loss_fn(p, bstats, batch)[0])(params)
    # keep the whole gradient alive (no DCE) but fetch one scalar
    return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

timed("loss_forward_ms", fwd_only, params, bstats, batch)
timed("grad_ms", grad_fn, params, bstats, batch)

tx, _ = build_optimizer(ConfigDict({
    "OPTIMIZER": "adam_onecycle", "LR": 1e-3, "WEIGHT_DECAY": 0.01,
    "MOMS": [0.95, 0.85], "PCT_START": 0.4, "DIV_FACTOR": 10,
    "GRAD_NORM_CLIP": 10}), 1000, params)
state = TrainState(params=params, batch_stats=bstats,
                   opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
step_fn = jax.jit(make_train_step(model, assigner, tx, lw, cfg))

def run_step(state, batch):
    s, tb = step_fn(state, batch)
    return tb["loss"]

timed("full_step_ms", run_step, state, batch)
