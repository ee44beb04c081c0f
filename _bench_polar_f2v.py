"""On-chip knob scan for the polar f2v stage (models/polar_f2v.py).

The round-4 stage table puts the polar f2v + collapse at 25.5 ms of the
42 ms B=1 forward — still the largest stage. Its cost has three movable
parts: the (B, J, K, Z, C) slab traffic (scales with zeta_bins J), the
exact near-field side gather (scales with near_columns), and the fixed
shear/resample + pass-3 gather. This scans (zeta_bins, near_columns) at
flagship scale; pair each point with the CPU accuracy numbers from
tests/test_polar_f2v.py-style far-field comparisons (run with
--accuracy on CPU) to pick the shipped default.

Usage:  python _bench_polar_f2v.py            # chip timing scan
        JAX_PLATFORMS=cpu python _bench_polar_f2v.py --accuracy
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 1
IMG = (516, 1936)
GRID = (320, 320, 31)
PC = (0.0, -25.6, -3.0, 51.2, 25.6, 2.0)
OUTC = 128
BEVC = 64
DTYPE = jnp.bfloat16
VARIANTS = [(192, 20), (192, 8), (192, 0), (128, 20), (96, 20), (128, 8)]


def _flagship_inputs(b=B, dtype=DTYPE):
    rng = np.random.RandomState(0)
    h, w = IMG
    feats = [
        jnp.asarray(rng.randn(b, -(-h // 4), -(-w // 4), 64), dtype),
        jnp.asarray(rng.randn(b, -(-h // 8), -(-w // 8), 192), dtype),
    ]
    l2c = jnp.tile(jnp.asarray(
        [[0, -1, 0, 0.05], [0, 0, -1, -0.1], [1, 0, 0, 0.2], [0, 0, 0, 1]],
        jnp.float32), (b, 1, 1))
    f = 10.0 * w / 48.0
    c2i = jnp.tile(jnp.asarray(
        [[f, 0, w / 2, 1.0], [0, f, h / 2, -0.5], [0, 0, 1, 0.002]],
        jnp.float32), (b, 1, 1))
    bda = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    return feats, l2c, c2i, bda


def _polar_module(zeta_bins, near_columns, grid=GRID, pc=PC, img=IMG,
                  dtype=DTYPE):
    import flax.linen as nn

    from hgsfusion_tpu.models import polar_f2v as P

    class M(nn.Module):
        @nn.compact
        def __call__(self, feats, l2c, c2i, bda):
            return P.polar_image_bev(
                P._F2VScope(
                    sum_channels=sum(f.shape[-1] for f in feats),
                    out_channels=OUTC, dtype=dtype, name="f2v"),
                P._CollapseScope(
                    in_channels=OUTC, nz=grid[2], out_channels=BEVC,
                    dtype=dtype, name="map_to_bev"),
                feats, l2c, c2i, img, bda, False,
                grid_size=grid, pc_range=pc, zeta_bins=zeta_bins,
                near_columns=near_columns, bev_aug=True, dtype=dtype,
            )

    return M()


def timing_scan():
    feats, l2c, c2i, bda = _flagship_inputs()
    results = {}
    for jb, nn_cols in VARIANTS:
        name = f"J{jb}_N{nn_cols}"
        try:
            m = _polar_module(jb, nn_cols)
            variables = jax.jit(
                lambda: m.init(jax.random.PRNGKey(0), feats, l2c, c2i, bda)
            )()
            fn = jax.jit(lambda v, f: m.apply(v, f, l2c, c2i, bda))
            out = fn(variables, feats)
            _ = float(jnp.sum(out.astype(jnp.float32)))  # compile
            out = fn(variables, feats)
            _ = float(jnp.sum(out.astype(jnp.float32)))  # warmup
            best = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(10):
                    out = fn(variables, feats)
                _ = float(jnp.sum(out.astype(jnp.float32)))
                best.append((time.perf_counter() - t0) / 10)
            ms = sorted(best)[1] * 1e3
            results[name] = round(ms, 2)
            print(f"{name}: {ms:.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:160]
            results[name] = f"FAILED: {msg}"
            print(f"{name}: FAILED: {msg}", flush=True)
    print(json.dumps({"metric": "polar_f2v_knob_scan", "batch": B,
                      "ms": results}), flush=True)


def accuracy_scan(flagship=False):
    """CPU: far-field rel-L2 vs the exact gather path per variant.

    flagship=True runs the TRUE flagship shapes (320x320x31 grid,
    516x1936 image) — slow on CPU (the gather reference materializes the
    full quad sample) but it is the scale the J (zeta_bins) choice must
    be defended at: the blur per zeta node scales with the image height
    in map rows, so a small-scale 'J is free' result does not transfer."""
    import flax.linen as nn

    from hgsfusion_tpu.models.frustum import (
        FrustumGridGenerator,
        FrustumToVoxelMultiScale,
    )
    from hgsfusion_tpu.models.occupancy import Conv2DCollapse

    grid = GRID if flagship else (80, 80, 12)
    pc = PC
    img = IMG if flagship else (128, 480)
    rng = np.random.RandomState(1)
    h, w = img
    feats = [
        jnp.asarray(rng.randn(1, -(-h // 4), -(-w // 4), 64), jnp.float32),
        jnp.asarray(rng.randn(1, -(-h // 8), -(-w // 8), 192), jnp.float32),
    ]
    l2c = jnp.tile(jnp.asarray(
        [[0, -1, 0, 0.05], [0, 0, -1, -0.1], [1, 0, 0, 0.2], [0, 0, 0, 1]],
        jnp.float32), (1, 1, 1))
    f = 10.0 * w / 48.0
    c2i = jnp.tile(jnp.asarray(
        [[f, 0, w / 2, 1.0], [0, f, h / 2, -0.5], [0, 0, 1, 0.002]],
        jnp.float32), (1, 1, 1))
    bda = jnp.tile(jnp.eye(4, dtype=jnp.float32), (1, 1, 1))

    class G(nn.Module):
        @nn.compact
        def __call__(self, feats, l2c, c2i, bda):
            g = FrustumGridGenerator(
                grid, pc, {"mode": "LID", "depth_min": 1.0,
                           "depth_max": 51.2, "num_bins": 16},
                bev_aug=True)(l2c, c2i, img, bda=bda)
            vox = FrustumToVoxelMultiScale(
                out_channels=OUTC, name="f2v")(feats, g, False)
            return Conv2DCollapse(
                num_bev_features=BEVC, name="map_to_bev")(vox, False)

    gm = G()
    gv = gm.init(jax.random.PRNGKey(0), feats, l2c, c2i, bda)
    ref = np.array(gm.apply(gv, feats, l2c, c2i, bda), np.float64)
    results = {}
    for jb, nn_cols in VARIANTS:
        m = _polar_module(jb, nn_cols, grid=grid, pc=pc, img=img,
                          dtype=jnp.float32)
        out = np.array(m.apply(gv, feats, l2c, c2i, bda), np.float64)
        rel = float(np.linalg.norm(out - ref) / np.linalg.norm(ref))
        corr = float(np.corrcoef(out.ravel(), ref.ravel())[0, 1])
        results[f"J{jb}_N{nn_cols}"] = {"rel_l2": round(rel, 4),
                                        "corr": round(corr, 5)}
        print(f"J{jb}_N{nn_cols}: rel_l2={rel:.4f} corr={corr:.5f}",
              flush=True)
    print(json.dumps({"metric": "polar_f2v_accuracy_scan",
                      "flagship": flagship,
                      "white_noise_feats": True, "results": results}),
          flush=True)


if __name__ == "__main__":
    if "--accuracy_flagship" in sys.argv:
        accuracy_scan(flagship=True)
    elif "--accuracy" in sys.argv:
        accuracy_scan()
    else:
        timing_scan()
