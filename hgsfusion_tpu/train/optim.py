"""Optimizer + OneCycle LR/momentum schedules (optax).

Reference: tools/train_utils/optimization/learning_schedules_fastai.py
(OneCycle:60-78, annealing_cos:53-56) and fastai_optim.py true_wd
(decoupled p *= (1 - wd*lr) decay, = AdamW). The fastai OptimWrapper's
mutable `mom` becomes a beta1 *schedule* injected into adamw; frozen
subtrees (the DDN image backbone) are masked out entirely.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def annealing_cos(start: float, end: float, pct):
    """Cosine anneal start->end as pct goes 0->1 (learning_schedules_fastai:53-56)."""
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def onecycle_lr_schedule(total_steps: int, lr_max: float, div_factor: float,
                         pct_start: float) -> Callable:
    """low->lr_max over pct_start, then lr_max->low/1e4 (OneCycle:60-78)."""
    low = lr_max / div_factor
    a1 = int(total_steps * pct_start)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        up = annealing_cos(low, lr_max, jnp.clip(step / max(a1, 1), 0.0, 1.0))
        down = annealing_cos(
            lr_max, low / 1e4,
            jnp.clip((step - a1) / max(total_steps - a1, 1), 0.0, 1.0),
        )
        return jnp.where(step < a1, up, down)

    return schedule


def onecycle_mom_schedule(total_steps: int, moms, pct_start: float) -> Callable:
    """beta1: moms[0]->moms[1] over pct_start, then back (OneCycle:73-75)."""
    a1 = int(total_steps * pct_start)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        up = annealing_cos(moms[0], moms[1], jnp.clip(step / max(a1, 1), 0.0, 1.0))
        down = annealing_cos(
            moms[1], moms[0],
            jnp.clip((step - a1) / max(total_steps - a1, 1), 0.0, 1.0),
        )
        return jnp.where(step < a1, up, down)

    return schedule


def default_frozen_predicate(path) -> bool:
    """True for parameters of the frozen DDN image backbone."""
    return any(getattr(k, "key", None) == "ddn_backbone" for k in path)


def build_optimizer(optim_cfg, total_steps: int, params,
                    frozen_predicate: Optional[Callable] = None):
    """optax chain matching the reference adam_onecycle recipe.

    clip_grad_norm(GRAD_NORM_CLIP) -> AdamW(b1=mom schedule, b2=0.99,
    decoupled wd) with the OneCycle LR; frozen params get zero updates.
    Returns (tx, lr_schedule) — lr_schedule for logging.
    """
    frozen_predicate = frozen_predicate or default_frozen_predicate
    name = optim_cfg.get("OPTIMIZER", "adam_onecycle")
    lr = float(optim_cfg.LR)
    wd = float(optim_cfg.get("WEIGHT_DECAY", 0.0))

    if name == "adam_onecycle":
        lr_schedule = onecycle_lr_schedule(
            total_steps, lr, float(optim_cfg.DIV_FACTOR), float(optim_cfg.PCT_START)
        )
        mom_schedule = onecycle_mom_schedule(
            total_steps, list(optim_cfg.MOMS), float(optim_cfg.PCT_START)
        )
        opt = optax.inject_hyperparams(
            lambda learning_rate, b1: optax.adamw(
                learning_rate=learning_rate, b1=b1, b2=0.99, eps=1e-8,
                weight_decay=wd,
            )
        )(learning_rate=lr_schedule, b1=mom_schedule)
    elif name == "adam":
        lr_schedule = lambda step: jnp.asarray(lr)  # noqa: E731
        opt = optax.adamw(lr, weight_decay=wd)
    elif name == "sgd":
        lr_schedule = lambda step: jnp.asarray(lr)  # noqa: E731
        opt = optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(lr, momentum=float(optim_cfg.get("MOMENTUM", 0.9))),
        )
    else:
        raise NotImplementedError(name)

    chain = [optax.clip_by_global_norm(float(optim_cfg.get("GRAD_NORM_CLIP", 10.0)))]
    chain.append(opt)
    tx = optax.chain(*chain)

    # freeze mask: frozen leaves get set_to_zero (no update, no wd, no state)
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "frozen" if frozen_predicate(path) else "train", params
    )
    tx = optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels
    )
    return tx, lr_schedule
