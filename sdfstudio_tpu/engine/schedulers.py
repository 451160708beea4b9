"""Learning-rate schedules as optax-compatible pure functions of step.

Functional spec: reference nerfstudio/engine/schedulers.py:27-215. Each
config produces a ``schedule(step) -> multiplier`` (relative to lr_init),
combined with the optimizer's base lr in engine/optimizers.py.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """Exponential log-lerp decay (jaxnerf; reference schedulers.py:41-74)."""

    kind: str = "exponential_decay"
    lr_final: float = 5e-6
    max_steps: int = 1000000
    lr_delay_steps: int = 0
    lr_delay_mult: float = 1.0
    # multistep / warmup variants
    warm_up_end: int = 5000
    learning_rate_alpha: float = 0.05
    milestones: Sequence[int] = (300000, 400000, 500000)
    gamma: float = 0.33
    decay_rate: float = 0.1

    def build(self, lr_init: float) -> Schedule:
        if self.kind == "exponential_decay":
            return exponential_decay_schedule(
                lr_init, self.lr_final, self.max_steps, self.lr_delay_steps, self.lr_delay_mult
            )
        if self.kind == "delayed_exponential":
            base = exponential_decay_schedule(lr_init, self.lr_final, self.max_steps)
            delay = self.warm_up_end

            def sched(step):
                return jnp.where(step > delay, base(jnp.maximum(step - delay, 0)), 0.0)

            return sched
        if self.kind == "multistep":
            ms = [self.max_steps // 2, self.max_steps * 3 // 4, self.max_steps * 9 // 10]
            return multistep_schedule(ms, 0.33)
        if self.kind == "exponential":
            rate = self.decay_rate ** (1.0 / self.max_steps)

            def sched(step):
                return rate**step

            return sched
        if self.kind == "neus":
            return neus_schedule(self.warm_up_end, self.learning_rate_alpha, self.max_steps)
        if self.kind == "multistep_warmup":
            return multistep_warmup_schedule(self.warm_up_end, list(self.milestones), self.gamma)
        if self.kind == "none":
            return lambda step: jnp.asarray(1.0)
        raise ValueError(f"unknown scheduler kind {self.kind}")


def neus_scheduler_config(warm_up_end=5000, learning_rate_alpha=0.05, max_steps=300000):
    return SchedulerConfig(
        kind="neus",
        warm_up_end=warm_up_end,
        learning_rate_alpha=learning_rate_alpha,
        max_steps=max_steps,
    )


def exponential_decay_schedule(
    lr_init: float,
    lr_final: float,
    max_steps: int,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
) -> Schedule:
    """jaxnerf log-lerp multiplier (reference schedulers.py:42-74)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        return delay_rate * log_lerp / lr_init

    return sched


def multistep_schedule(milestones: List[int], gamma: float) -> Schedule:
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        index = jnp.sum(step >= jnp.asarray(milestones, jnp.float32))
        return gamma**index

    return sched


def neus_schedule(warm_up_end: int, learning_rate_alpha: float, max_steps: int) -> Schedule:
    """Linear warmup then cosine decay to alpha (reference schedulers.py:170-186)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(warm_up_end, 1)
        progress = (step - warm_up_end) / max(max_steps - warm_up_end, 1)
        alpha = learning_rate_alpha
        cos = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        return jnp.where(step < warm_up_end, warm, cos)

    return sched


def multistep_warmup_schedule(warm_up_end: int, milestones: List[int], gamma: float) -> Schedule:
    """Linear warmup then stepped decay (reference schedulers.py:188-215)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(warm_up_end, 1)
        index = jnp.sum(step >= jnp.asarray(milestones, jnp.float32))
        return jnp.where(step < warm_up_end, warm, gamma**index)

    return sched
