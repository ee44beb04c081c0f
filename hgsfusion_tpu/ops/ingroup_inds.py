"""Per-group running index assignment.

TPU-native equivalent of `pcdet.ops.ingroup_inds` (DSVT's set-partition
helper, src/ingroup_inds_kernel.cu:31-75). The CUDA kernel hands out
indices with an atomicAdd race, so within a group the order is
nondeterministic; here the index is the element's order of APPEARANCE in
its group — a deterministic refinement of the same contract (each group's
elements receive 0..k-1 exactly once).

Implemented as stable-sort + run-position + inverse scatter: O(N log N),
static shapes, jit/vmap friendly.
"""
from __future__ import annotations

import jax.numpy as jnp


def ingroup_inds(group_ids):
    """group_ids (N,) int -> (N,) int32: position of each element within
    its group, in order of appearance. Negative ids are treated as ordinary
    group labels (callers mask invalid slots themselves, matching the
    reference which indexes every input row)."""
    ids = jnp.asarray(group_ids)
    n = ids.shape[0]
    arange = jnp.arange(n, dtype=jnp.int32)
    order = jnp.argsort(ids, stable=True)
    sorted_ids = ids[order]
    is_start = jnp.concatenate([
        jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]])
    run_start = jnp.maximum.accumulate(
        jnp.where(is_start, arange, jnp.int32(0)))
    pos = arange - run_start
    return jnp.zeros((n,), jnp.int32).at[order].set(pos)
