"""LR schedules (optax-compatible callables).

Rebuilds ``engine/lr_policy.py:19-66``: WarmUpPolyLR (the one the
trainers use), PolyLR, MultiStageLR, LinearIncreaseLR.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def poly_schedule(start_lr: float, lr_power: float, total_iters: int):
    """lr_policy.PolyLR:19-27."""
    total = float(total_iters)

    def schedule(count):
        frac = 1.0 - jnp.asarray(count, jnp.float32) / total
        return start_lr * jnp.power(jnp.maximum(frac, 0.0), lr_power)

    return schedule


def warmup_poly_schedule(start_lr: float, lr_power: float, total_iters: int,
                         warmup_steps: int, end_lr: float = 1e-8):
    """lr_policy.WarmUpPolyLR:30-43: linear warmup then poly decay clipped
    to [end_lr, start_lr]."""
    total = float(total_iters)
    warm = float(warmup_steps)

    def schedule(count):
        c = jnp.asarray(count, jnp.float32)
        warm_lr = start_lr * (c / jnp.maximum(warm, 1.0))
        frac = 1.0 - c / total
        poly = start_lr * jnp.power(jnp.maximum(frac, 0.0), lr_power)
        poly = jnp.clip(poly, end_lr, start_lr)
        return jnp.where(c < warm, warm_lr, poly)

    return schedule


def multistage_schedule(lr_stages: Sequence[Tuple[int, float]]):
    """lr_policy.MultiStageLR:46-55 (epoch-indexed stages)."""
    bounds = jnp.asarray([s[0] for s in lr_stages], jnp.float32)
    values = jnp.asarray([s[1] for s in lr_stages], jnp.float32)

    def schedule(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        idx = jnp.sum(e >= bounds)
        return values[jnp.minimum(idx, len(lr_stages) - 1)]

    return schedule


def linear_increase_schedule(start_lr: float, end_lr: float, warm_iters: int):
    """lr_policy.LinearIncreaseLR:58-66."""
    delta = (end_lr - start_lr) / warm_iters

    def schedule(count):
        return start_lr + jnp.asarray(count, jnp.float32) * delta

    return schedule
