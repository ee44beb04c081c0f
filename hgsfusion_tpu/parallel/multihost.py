"""Multi-host result merging for distributed evaluation.

Reference: common_utils.merge_results_dist:229-250 — ranks pickle their
partial results to a shared tmpdir and rendezvous on a barrier. The
TPU-native replacement gathers fixed-shape prediction arrays across hosts
over ICI/DCN with `multihost_utils.process_allgather`; no filesystem
rendezvous, no pickling.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import numpy as np


def merge_detections_across_hosts(out: Dict) -> Dict:
    """All-gather fixed-shape detection dicts (boxes/scores/labels/valid).

    Each host passes its local (B_local, ...) arrays; returns the
    concatenated global batch on every host. Single-host is a no-op.
    """
    if jax.process_count() == 1:
        return out
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(out)
    # process_allgather stacks a leading process axis; flatten into batch
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x).reshape((-1,) + np.asarray(x).shape[2:]), gathered
    )


def shard_indices_for_host(num_frames: int) -> List[int]:
    """Frame indices this host evaluates (contiguous shards, like the
    reference's DistributedSampler without padding duplicates)."""
    p = jax.process_index()
    n = jax.process_count()
    per = (num_frames + n - 1) // n
    return list(range(p * per, min((p + 1) * per, num_frames)))
