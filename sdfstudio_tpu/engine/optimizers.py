"""Per-parameter-group optimizers.

Functional spec: reference nerfstudio/engine/optimizers.py:70-178 — a dict
of named param groups (fields / field_background / proposal_networks /
camera_opt), each with its own optimizer + scheduler. Here each group gets
its own optax chain with an injected schedule; groups are combined with
``optax.multi_transform`` keyed by the top-level key of the params dict.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import optax

from sdfstudio_tpu.engine.schedulers import SchedulerConfig


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Adam-family config (reference optimizers.py:34-67)."""

    kind: str = "adam"  # adam | adamw | radam | sgd
    lr: float = 5e-4
    eps: float = 1e-8
    weight_decay: float = 0.0
    max_norm: Optional[float] = None

    def build(self, schedule) -> optax.GradientTransformation:
        lr_fn = lambda step: self.lr * schedule(step)
        if self.kind == "adam":
            tx = optax.adam(lr_fn, eps=self.eps)
            if self.weight_decay:
                tx = optax.chain(optax.add_decayed_weights(self.weight_decay), tx)
        elif self.kind == "adamw":
            tx = optax.adamw(lr_fn, eps=self.eps, weight_decay=self.weight_decay)
        elif self.kind == "radam":
            tx = optax.radam(lr_fn, eps=self.eps)
        elif self.kind == "sgd":
            tx = optax.sgd(lr_fn)
        else:
            raise ValueError(f"unknown optimizer kind {self.kind}")
        if self.max_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(self.max_norm), tx)
        return tx


@dataclasses.dataclass(frozen=True)
class OptimizerGroupConfig:
    optimizer: OptimizerConfig = OptimizerConfig()
    scheduler: Optional[SchedulerConfig] = None


def build_optimizer(
    group_configs: Dict[str, OptimizerGroupConfig], params: Dict[str, Any]
) -> optax.GradientTransformation:
    """One optax transformation handling all named groups
    (reference setup_optimizers, optimizers.py:70-90). Groups present in
    ``params`` but absent from ``group_configs`` fall back to the "default"
    entry or a frozen (zero-update) transform."""
    transforms = {}
    for name in params.keys():
        gc = group_configs.get(name) or group_configs.get("default")
        if gc is None:
            transforms[name] = optax.set_to_zero()
            continue
        sched = (gc.scheduler or SchedulerConfig(kind="none")).build(gc.optimizer.lr)
        transforms[name] = gc.optimizer.build(sched)

    def label_fn(p):
        return {k: jax.tree_util.tree_map(lambda _: k, v) for k, v in p.items()}

    return optax.multi_transform(transforms, label_fn)


def learning_rates_at(group_configs: Dict[str, OptimizerGroupConfig], step) -> Dict[str, float]:
    """Current lr per group, for logging (reference optimizers.py:160)."""
    out = {}
    for name, gc in group_configs.items():
        sched = (gc.scheduler or SchedulerConfig(kind="none")).build(gc.optimizer.lr)
        out[name] = float(gc.optimizer.lr * sched(step))
    return out
