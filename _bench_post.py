"""Decompose the 10 ms post_process stage (decode + top-k + greedy NMS).

Round-4 stage table: post_process is 10.0 ms of the 37.2 ms polar-view
e2e — third-largest. Three candidate holders: the 614 k-anchor box
decode (elementwise), exact_top_k(614k -> 4096), and the lazy greedy
NMS while_loop (worst case = NMS_POST_MAXSIZE 500 iterations x one
(1, 4096) rotated-IoU row; the synthetic bench's random scores hit the
worst case, real frames keep fewer). Also times the loop at smaller
kept caps to separate per-iteration overhead from IoU row cost.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from hgsfusion_tpu.models.anchor_head import generate_predicted_boxes
from hgsfusion_tpu.models.anchors import TargetAssigner
from hgsfusion_tpu.ops.nms import greedy_nms_lazy
from hgsfusion_tpu.ops.topk import exact_top_k
from hgsfusion_tpu.config import load_config
from hgsfusion_tpu.utils.box_coder import ResidualCoder


def timed(fn, chain, *args, iters=20):
    """Chained on-device timing per the repo's tunnel-benchmarking rules
    (round-4 lesson: independent repeated calls with identical args carry
    per-call dispatch overhead and mis-time through the remote-exec
    tunnel — these pieces summed to 16.6 ms where the in-graph stage
    bench measured 10).

    `chain(args, out) -> args` feeds a data-dependent epsilon of each
    iteration's output back into the next iteration's input, so ONE
    jitted graph serializes all `iters` runs on-device with a single
    final fetch. The epsilon (1e-30 * a scalar of the output) cannot
    change results but defeats DCE/CSE."""

    def chained(*a):
        for _ in range(iters):
            out = fn(*a)
            a = chain(a, out)
        return jax.tree_util.tree_reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), out,
            jnp.float32(0))

    f = jax.jit(chained)
    f(*args).block_until_ready()
    f(*args).block_until_ready()  # warmup
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        best.append((time.perf_counter() - t0) / iters)
    return sorted(best)[1] * 1e3


def main():
    yaml_cfg = load_config("configs/hgsfusion_vod.yaml")
    from hgsfusion_tpu.config import model_config_from_yaml

    cfg = model_config_from_yaml(yaml_cfg)
    assigner = TargetAssigner(
        [dict(c) for c in yaml_cfg.MODEL.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG],
        cfg.grid_size, cfg.pc_range, class_names=cfg.class_names)
    ny, nx = cfg.grid_size[1], cfg.grid_size[0]
    na = assigner.flat_anchors.shape[0]
    rng = np.random.RandomState(0)
    cls = jnp.asarray(rng.randn(1, ny, nx, 6 * 3), jnp.float32)
    box = jnp.asarray(rng.randn(1, ny, nx, 6 * 7) * 0.1, jnp.float32)
    dirs = jnp.asarray(rng.randn(1, ny, nx, 6 * 2), jnp.float32)

    def decode(cls, box, dirs):
        return generate_predicted_boxes(
            cls, box, dirs, assigner.flat_anchors, assigner.box_coder,
            cfg.num_class, dir_offset=cfg.dir_offset,
            dir_limit_offset=cfg.dir_limit_offset,
            num_dir_bins=cfg.num_dir_bins)

    def chain_decode(a, out):
        eps = jnp.sum(out[0].astype(jnp.float32)) * jnp.float32(1e-30)
        return (a[0] + eps, a[1], a[2])

    bc, bb = jax.jit(decode)(cls, box, dirs)
    print(f"anchors: {na}", flush=True)
    print(f"decode: {timed(decode, chain_decode, cls, box, dirs):.2f} ms",
          flush=True)

    scores = jax.nn.sigmoid(bc).max(axis=-1)[0]

    def topk(s):
        return exact_top_k(s, 4096)

    def chain_topk(a, out):
        eps = out[0][0].astype(jnp.float32) * jnp.float32(1e-30)
        return (a[0] + eps,)

    ts, ti = jax.jit(topk)(scores)
    print(f"exact_top_k(614k->4096): "
          f"{timed(topk, chain_topk, scores):.2f} ms", flush=True)

    top_boxes = bb[0][ti]
    valid = ts > -1e30

    def chain_nms(a, out):
        eps = jnp.sum(out).astype(jnp.float32) * jnp.float32(1e-30)
        return (a[0] + eps, a[1])

    for cap in (500, 128, 32):
        f = lambda b, v, c=cap: greedy_nms_lazy(b, v, 0.01, c)
        ms = timed(f, chain_nms, top_boxes, valid)
        kept = int(jax.jit(f)(top_boxes, valid).sum())
        print(f"greedy_nms_lazy cap={cap}: {ms:.2f} ms (kept {kept})",
              flush=True)


if __name__ == "__main__":
    main()
