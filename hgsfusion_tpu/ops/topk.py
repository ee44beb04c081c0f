"""Exact large-k top-k for TPU.

XLA's `lax.top_k` is pathologically slow on TPU for large k over large n
(the NMS pre-selection needs top-4096 of 614,400 anchor scores; measured:
does not finish a single call in minutes). This implements an exact
replacement:

  1. binary-search the k-th largest value over the float range
     (O(log) passes, each a cheap masked count over n),
  2. compact the indices of elements above the threshold with a
     cumsum + scatter (no sort over n),
  3. order the k selected elements among themselves with a small sort.

Tie-breaking among elements equal to the threshold value is by index
(arbitrary, same as lax.top_k's unspecified tie order).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def exact_top_k(scores: jnp.ndarray, k: int, num_iters: int = 48):
    """(n,) scores -> (values (k,), indices (k,)), descending by value."""
    n = scores.shape[0]
    assert k <= n
    scores = scores.astype(jnp.float32)

    mn = jnp.min(scores)
    # relative offset: "- 1.0" alone is absorbed by f32 rounding at large
    # magnitudes (ulp(1e9) = 64), which would break the bisection invariant
    lo0 = mn - (jnp.abs(mn) * 1e-5 + 1.0)
    hi0 = jnp.max(scores)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(scores > mid)
        # keep the invariant count(> lo) >= k and count(> hi) < k
        return jnp.where(cnt >= k, mid, lo), jnp.where(cnt >= k, hi, mid)

    lo, hi = jax.lax.fori_loop(0, num_iters, body, (lo0, hi0))
    tau = lo  # count(scores > tau) >= k, and tau ~ the k-th value

    gt = scores > hi  # strictly above the k-th value: count < k
    n_gt = jnp.sum(gt.astype(jnp.int32))
    eq = (scores > tau) & ~gt  # the tie band around the k-th value
    pos_gt = jnp.cumsum(gt.astype(jnp.int32)) - 1
    pos_eq = jnp.cumsum(eq.astype(jnp.int32)) - 1
    take_eq = eq & (pos_eq < (k - n_gt))
    slot = jnp.where(gt, pos_gt, jnp.where(take_eq, n_gt + pos_eq, k))
    idx = (
        jnp.zeros((k + 1,), jnp.int32)
        .at[slot]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")[:k]
    )
    vals = scores[idx]
    order = jnp.argsort(-vals)
    return vals[order], idx[order]
