"""Optimizer + LR schedule factory.

The reference uses AdamW + ``torch.optim.lr_scheduler.OneCycleLR``
stepped every iteration (``train_dfaust_rot.py:530-557,267-275``), with
gradient clipping by norm where configured.  ``optax.onecycle_schedule``
implements the same cosine-annealed 1cycle policy (default torch params:
pct_start 0.3, div_factor 25, final_div_factor 1e4).
"""
from __future__ import annotations

from typing import Optional

import optax

__all__ = ["make_optimizer", "onecycle"]


def onecycle(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> optax.Schedule:
    # optax.cosine_onecycle_schedule floors the warmup boundary to
    # int(pct_start * total_steps); at small step counts that phase
    # collapses to zero length and the schedule divides by zero -> NaN LR
    # poisoning every parameter on the first update.  Build the same
    # piecewise schedule with the warmup clamped to [1, total-1] steps.
    total_steps = max(int(total_steps), 2)
    warm = min(max(int(pct_start * total_steps), 1), total_steps - 1)
    return optax.piecewise_interpolate_schedule(
        "cosine",
        init_value=max_lr / div_factor,
        boundaries_and_scales={
            warm: div_factor,
            total_steps: 1.0 / (div_factor * final_div_factor),
        },
    )


def make_optimizer(
    max_lr: float,
    total_steps: int,
    weight_decay: float = 1e-4,
    clip_grad_norm: Optional[float] = None,
    accum_steps: int = 1,
    pct_start: float = 0.3,
) -> optax.GradientTransformation:
    """AdamW + 1cycle (+ optional clipping and gradient accumulation).

    ``accum_steps`` reproduces the reference's ``accum_grads``
    (``train_dfaust_rot.py:263-273``) via ``optax.MultiSteps``.

    ``total_steps`` counts CALLS (micro-batches).  MultiSteps advances
    the inner optimizer — and therefore the schedule — only every k-th
    call, so the 1cycle length is the number of real optimizer steps;
    without the division the schedule would traverse only its first
    1/k and the final LR anneal would never happen.
    """
    sched = onecycle(
        max_lr, max(total_steps // max(accum_steps, 1), 1),
        pct_start=pct_start,
    )
    chain = []
    if clip_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    chain.append(optax.adamw(sched, weight_decay=weight_decay))
    tx = optax.chain(*chain)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
