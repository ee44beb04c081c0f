"""Is the dilated-conv stage of the DDN backbone leaving MXU on the table?

The round-4 stage table makes camera (12.7 ms) the largest stage of the
polar-view forward. Its FLOPs concentrate in ResNet101 stage3 (23
bottlenecks, dilation 2) + stage4 (3, dilation 4) at /8 = 65x242. This
times the hot conv shape as (a) XLA dilated conv, (b) the same-FLOPs
dense conv (dilation 1), and (c) a space-to-batch equivalent (split the
spatial grid into dilation^2 phases -> dense conv -> interleave) to see
whether XLA's native dilation lowering is at parity with the dense
roofline on v5e. If (a) ~= (b), the backbone is already at the conv
roofline and the camera stage is closed; if (a) >> (b), space-to-batch
is the fix.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 65, 242
DT = jnp.bfloat16


def timed(conv_fn, x, k, iters=20):
    """Chained on-device iterations (cin == cout so out feeds back in):
    independent repeated calls with identical args mis-time through the
    remote-exec tunnel (observed above-roofline numbers), exactly the
    round-3 lesson in bench.py — serialize by data dependency."""

    def chained(x, k):
        for _ in range(iters):
            x = conv_fn(x, k) * jnp.asarray(0.05, x.dtype)
        return jnp.sum(x.astype(jnp.float32))

    f = jax.jit(chained)
    f(x, k).block_until_ready()
    f(x, k).block_until_ready()  # warmup
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x, k))
        best.append((time.perf_counter() - t0) / iters)
    return sorted(best)[1] * 1e3


def conv(x, k, dilation):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((dilation, dilation),) * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(DT)


def s2b_conv(x, k, d):
    """Space-to-batch: d*d phase shifts each see a dense 3x3 conv."""
    b, h, w, c = x.shape
    hp = -(-h // d) * d
    wp = -(-w // d) * d
    xp = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    # (b, d, hp/d, d, wp/d, c) -> (b*d*d, hp/d, wp/d, c)
    xs = xp.reshape(b, hp // d, d, wp // d, d, c).transpose(0, 2, 4, 1, 3, 5)
    xs = xs.reshape(b * d * d, hp // d, wp // d, c)
    ys = jax.lax.conv_general_dilated(
        xs, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(DT)
    ys = ys.reshape(b, d, d, hp // d, wp // d, -1).transpose(0, 3, 1, 4, 2, 5)
    return ys.reshape(b, hp, wp, -1)[:, :h, :w]


def main():
    rng = np.random.RandomState(0)
    for cin, cout, d, tag in [(256, 256, 2, "stage3 3x3 d2"),
                              (512, 512, 4, "stage4 3x3 d4")]:
        x = jnp.asarray(rng.randn(1, H, W, cin), DT)
        k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, DT)
        flops = 2 * H * W * 9 * cin * cout / 1e9
        t_dil = timed(lambda a, b, dd=d: conv(a, b, dd), x, k)
        t_dense = timed(lambda a, b: conv(a, b, 1), x, k)
        t_s2b = timed(lambda a, b, dd=d: s2b_conv(a, b, dd), x, k)
        print(f"{tag}: dilated {t_dil:.3f} ms ({flops/t_dil:.1f} TF/s) | "
              f"dense {t_dense:.3f} ms ({flops/t_dense:.1f} TF/s) | "
              f"s2b {t_s2b:.3f} ms ({flops/t_s2b:.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
