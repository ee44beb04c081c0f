import sys, time, json, numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _vod_flagship
from hgsfusion_tpu.models.anchors import TargetAssigner
from hgsfusion_tpu.config import load_config, ConfigDict
from hgsfusion_tpu.train.optim import build_optimizer
from hgsfusion_tpu.train.trainer import TrainState, make_train_step

CFG = "configs/hgsfusion_vod.yaml"
if "--cfg" in sys.argv:
    CFG = sys.argv[sys.argv.index("--cfg") + 1]
model, cfg, batch = _vod_flagship(config_path=CFG)
rng = np.random.RandomState(0)
gt = np.zeros((1, 64, 8), np.float32)
gt[0, :10, :7] = np.concatenate([
    rng.uniform(5, 45, (10, 1)), rng.uniform(-20, 20, (10, 1)),
    rng.uniform(-1.5, 0, (10, 1)), np.tile([3.9, 1.6, 1.56], (10, 1)),
    rng.uniform(-3, 3, (10, 1))], axis=1)
gt[0, :10, 7] = 1
batch = dict(batch); batch["gt_boxes"] = jnp.asarray(gt)

yaml_cfg = load_config(CFG)
assigner = TargetAssigner([dict(c) for c in yaml_cfg.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG],
                          cfg.grid_size, cfg.pc_range, class_names=cfg.class_names)
variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, False))(batch)
tx, _ = build_optimizer(ConfigDict({"OPTIMIZER": "adam_onecycle", "LR": 1e-3,
    "WEIGHT_DECAY": 0.01, "MOMS": [0.95, 0.85], "PCT_START": 0.4,
    "DIV_FACTOR": 10, "GRAD_NORM_CLIP": 10}), 1000, variables["params"])
state = TrainState(params=variables["params"], batch_stats=variables["batch_stats"],
                   opt_state=tx.init(variables["params"]), step=jnp.zeros((), jnp.int32))
lw = {"cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2, "code_weights": [1.0]*7}
step_fn = jax.jit(make_train_step(model, assigner, tx, lw, cfg))
t0 = time.perf_counter()
state, tb = step_fn(state, batch)
loss0 = float(tb["loss"])
print("compile+first step:", round(time.perf_counter()-t0, 1), "s, loss", loss0, flush=True)
t0 = time.perf_counter()
for _ in range(5):
    state, tb = step_fn(state, batch)
_ = float(tb["loss"])
print(json.dumps({"train_step_ms": round((time.perf_counter()-t0)/5*1000, 1)}))
