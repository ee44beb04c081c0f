"""DDN backbone on-chip timing: bf16 vs w8a8 int8 (VERDICT r4 #4).

The camera stage is the largest defended residual (13.2 ms vs a ~6.8 ms
FLOPs roofline, BASELINE.md round-4 stage table). The backbone is FROZEN
COCO weights (ddn_template.py:72-75), so int8 is a one-time, scannable
approximation. v5e MXU runs int8 at 2x bf16 throughput; if the stage is
MXU-bound the ceiling is ~2x on the conv time.

Times the ResNet101-dilated backbone apply at the exact flagship shape
(1, 516, 1936, 3), chained iterations, one final scalar fetch (tunnel
benchmarking rules). Also probes the channel_reduce+backbone composite
the model actually runs.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from hgsfusion_tpu.models.resnet import ResNetDeepLabBackbone

B, H, W = 1, 516, 1936
ITERS = 10


def timed(name, fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out[-1].astype(jnp.float32)))
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        _ = float(jnp.sum(out[-1].astype(jnp.float32)))
        rates.append((time.perf_counter() - t0) / ITERS)
    ms = sorted(rates)[1] * 1e3
    print(f"{name}: {ms:.2f} ms", flush=True)
    return ms


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

    m_bf = ResNetDeepLabBackbone(dtype=jnp.bfloat16)
    m_q8 = ResNetDeepLabBackbone(dtype=jnp.bfloat16, quant="w8a8")
    variables = jax.jit(
        lambda xx: m_bf.init(jax.random.PRNGKey(0), xx, False))(x)

    f_bf = jax.jit(lambda v, xx: m_bf.apply(v, xx, False))
    f_q8 = jax.jit(lambda v, xx: m_q8.apply(v, xx, False))

    ms_bf = timed("backbone bf16", f_bf, variables, x)
    ms_q8 = timed("backbone w8a8", f_q8, variables, x)
    print(f"speedup: {ms_bf / ms_q8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
