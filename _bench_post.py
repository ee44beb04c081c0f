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


def timed(fn, *args, iters=20):
    """CAVEAT (round 4): independent repeated calls with identical args
    through the remote-exec tunnel carry per-call dispatch overhead, so
    these absolute numbers run HIGH (the in-graph stage bench measured
    post at 10 ms where these pieces sum to 16.6). The RELATIVE
    decomposition (decode vs top-k vs NMS-loop scaling with the kept
    cap) is what this script is for; for absolute numbers, chain by
    data dependency (see _bench_dilated_conv.timed / bench.py)."""
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
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

    @jax.jit
    def decode(cls, box, dirs):
        return generate_predicted_boxes(
            cls, box, dirs, assigner.flat_anchors, assigner.box_coder,
            cfg.num_class, dir_offset=cfg.dir_offset,
            dir_limit_offset=cfg.dir_limit_offset,
            num_dir_bins=cfg.num_dir_bins)

    bc, bb = decode(cls, box, dirs)
    print(f"anchors: {na}", flush=True)
    print(f"decode: {timed(decode, cls, box, dirs):.2f} ms", flush=True)

    scores = jax.nn.sigmoid(bc).max(axis=-1)[0]

    @jax.jit
    def topk(s):
        return exact_top_k(s, 4096)

    ts, ti = topk(scores)
    print(f"exact_top_k(614k->4096): {timed(topk, scores):.2f} ms",
          flush=True)

    top_boxes = bb[0][ti]
    valid = ts > -1e30
    for cap in (500, 128, 32):
        f = jax.jit(lambda b, v, c=cap: greedy_nms_lazy(b, v, 0.01, c))
        ms = timed(f, top_boxes, valid)
        kept = int(f(top_boxes, valid).sum())
        print(f"greedy_nms_lazy cap={cap}: {ms:.2f} ms (kept {kept})",
              flush=True)


if __name__ == "__main__":
    main()
