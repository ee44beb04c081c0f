import time, numpy as np, jax, jax.numpy as jnp
import dataclasses
from __graft_entry__ import _vod_flagship
from hgsfusion_tpu.models.resnet import ResNetDeepLabBackbone, preprocess_images
from hgsfusion_tpu.models.frustum import FrustumGridGenerator, FrustumToVoxelMultiScale

model, cfg, batch = _vod_flagship()

def timed(name, fn, *args, iters=10):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.1f} ms/iter")
    return out

# 1) image backbone alone (bf16)
bb = ResNetDeepLabBackbone(stage_sizes=(3,4,23,3), dtype=jnp.bfloat16)
imgs = preprocess_images(batch["images"])
bv = jax.jit(lambda x: bb.init(jax.random.PRNGKey(0), x, False))(imgs)
bb_fwd = jax.jit(lambda v, x: bb.apply(v, x, False))
timed("resnet101 backbone", bb_fwd, bv, imgs)

# 2) frustum sample+reduce alone (bf16 features)
rng = np.random.RandomState(0)
feats = [jnp.asarray(rng.randn(1, 129, 484, 64).astype(np.float32)).astype(jnp.bfloat16),
         jnp.asarray(rng.randn(1, 65, 242, 64).astype(np.float32)).astype(jnp.bfloat16),
         jnp.asarray(rng.randn(1, 65, 242, 64).astype(np.float32)).astype(jnp.bfloat16),
         jnp.asarray(rng.randn(1, 65, 242, 64).astype(np.float32)).astype(jnp.bfloat16)]
gg = FrustumGridGenerator(cfg.grid_size, cfg.pc_range, cfg.disc_cfg, bev_aug=True)
grid = gg(batch["trans_lidar_to_cam"], batch["trans_cam_to_img"], cfg.image_size, batch["lidar_aug_matrix"])
f2v = FrustumToVoxelMultiScale(out_channels=128, dtype=jnp.bfloat16)
fv = jax.jit(lambda g, f: f2v.init(jax.random.PRNGKey(0), f, g, False))(grid, feats)
f2v_fwd = jax.jit(lambda v, f, g: f2v.apply(v, f, g, False))
timed("f2v sample+reduce", f2v_fwd, fv, feats, grid)
