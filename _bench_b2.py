import time, json, jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _vod_flagship
from hgsfusion_tpu.models.anchors import TargetAssigner
from hgsfusion_tpu.config import load_config
from hgsfusion_tpu.models.detector import post_process

model, cfg, batch1 = _vod_flagship()
B = 2
batch = {k: jnp.concatenate([v] * B, axis=0) for k, v in batch1.items()}
yaml_cfg = load_config("configs/hgsfusion_vod.yaml")
anchor_cfg = [dict(c) for c in yaml_cfg.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG]
assigner = TargetAssigner(anchor_cfg, cfg.grid_size, cfg.pc_range, class_names=cfg.class_names)
post_cfg = yaml_cfg.MODEL.POST_PROCESSING
variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, False))(batch)

@jax.jit
def infer(v, b):
    preds = model.apply(v, b, False)
    return post_process(preds, assigner.flat_anchors, assigner.box_coder, cfg,
        score_thresh=post_cfg.SCORE_THRESH, nms_thresh=post_cfg.NMS_CONFIG.NMS_THRESH,
        pre_max_size=post_cfg.NMS_CONFIG.NMS_PRE_MAXSIZE, post_max_size=post_cfg.NMS_CONFIG.NMS_POST_MAXSIZE)

out = infer(variables, batch); _ = float(jnp.sum(out["scores"]))
t0 = time.perf_counter()
for _ in range(10): out = infer(variables, batch)
_ = float(jnp.sum(out["scores"]))
fps = 10 * B / (time.perf_counter() - t0)
print(json.dumps({"batch": B, "fps": round(fps, 3)}))
