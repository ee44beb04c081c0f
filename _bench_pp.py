import time, numpy as np, jax, jax.numpy as jnp
from hgsfusion_tpu.models.anchors import TargetAssigner
from hgsfusion_tpu.config import load_config
from hgsfusion_tpu.models.detector import post_process
from hgsfusion_tpu.config import model_config_from_yaml

yaml_cfg = load_config("configs/hgsfusion_vod.yaml")
cfg = model_config_from_yaml(yaml_cfg)
anchor_cfg = [dict(c) for c in yaml_cfg.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG]
assigner = TargetAssigner(anchor_cfg, cfg.grid_size, cfg.pc_range, class_names=cfg.class_names)
post_cfg = yaml_cfg.MODEL.POST_PROCESSING
rng = np.random.RandomState(0)
ny, nx = 320, 320
preds = {
  "cls_preds": jnp.asarray(rng.randn(1, ny, nx, 18).astype(np.float32) - 4.0),
  "box_preds": jnp.asarray(0.1*rng.randn(1, ny, nx, 42).astype(np.float32)),
  "dir_cls_preds": jnp.asarray(rng.randn(1, ny, nx, 12).astype(np.float32)),
}
pp = jax.jit(lambda p: post_process(p, assigner.flat_anchors, assigner.box_coder, cfg,
    score_thresh=post_cfg.SCORE_THRESH, nms_thresh=post_cfg.NMS_CONFIG.NMS_THRESH,
    pre_max_size=post_cfg.NMS_CONFIG.NMS_PRE_MAXSIZE, post_max_size=post_cfg.NMS_CONFIG.NMS_POST_MAXSIZE))
t0=time.perf_counter()
out = pp(preds); jax.block_until_ready(out)
print("pp compile+first:", time.perf_counter()-t0)
t0=time.perf_counter()
for _ in range(3): out = pp(preds)
jax.block_until_ready(out)
print("pp s/call:", (time.perf_counter()-t0)/3)
