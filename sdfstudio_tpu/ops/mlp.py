"""MLP building blocks: weight-normalized linear layers, geometric (sphere)
initialization, and a generic skip-connection MLP.

Functional spec: reference nerfstudio/field_components/mlp.py:27-99 (generic
MLP) and nerfstudio/fields/sdf_field.py:276-315 (geometric init + weight
norm for the SDF geometry network) / sdf_field.py:354-363 (color net kaiming
init + weight norm).

Design note: all layers are plain ``jnp.dot`` matmuls — on TPU these map
straight onto the MXU and XLA fuses the softplus/relu epilogues, which is
what tiny-cuda-nn's fused MLP buys on GPU.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def softplus_beta100(x: jnp.ndarray) -> jnp.ndarray:
    """softplus with beta=100 (reference sdf_field.py:365): a numerically
    stable sharp softplus, ~relu with smooth corner."""
    return jax.nn.softplus(100.0 * x) / 100.0


class WNLinear(nn.Module):
    """Weight-normalized linear layer: W = g * V / ||V||_row.

    Matches torch.nn.utils.weight_norm(nn.Linear(...)) with dim=0: each
    output unit has a scalar gain g initialized to the row norm of the
    initial weight (so the initial effective W equals the raw init).
    """

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_effective: bool = False):
        in_dim = x.shape[-1]
        v = self.param("kernel", self.kernel_init, (in_dim, self.features))
        b = self.param("bias", self.bias_init, (self.features,))
        if self.use_weight_norm:
            # norm over the input axis — per-output-unit row norm in torch
            # terms; initialized from the actual v so the initial effective
            # kernel equals the raw init (torch weight_norm semantics).
            g = self.param("g", lambda key, shape: jnp.linalg.norm(v, axis=0), (self.features,))
            norm = jnp.linalg.norm(v, axis=0, keepdims=True)
            kernel = v * (g / jnp.maximum(norm, 1e-12))
        else:
            kernel = v
        if return_effective:
            # hand the effective (kernel, bias) to a fused consumer (the
            # Pallas fully-fused MLP); x is only used for its shape.
            return kernel, b
        return jnp.dot(x, kernel, preferred_element_type=x.dtype) + b


def geometric_kernel_init(
    layer: int,
    num_hidden_layers: int,
    in_dim0: int,
    skip_in: Sequence[int],
    bias: float,
    inside_outside: bool,
) -> Tuple[Callable, Callable]:
    """Kernel/bias initializers for layer ``layer`` of the SDF geometry MLP
    (reference sdf_field.py:284-310). Kernel shape convention is
    [fan_in, fan_out] (transposed from torch's [out, in])."""
    last = num_hidden_layers  # index of the output layer

    def kernel(key, shape):
        fan_in, fan_out = shape
        if layer == last:
            mean = np.sqrt(np.pi) / np.sqrt(fan_in)
            if inside_outside:
                mean = -mean
            return mean + 1e-4 * jax.random.normal(key, shape)
        if layer == 0:
            w = jnp.zeros(shape)
            w = w.at[:3, :].set(
                jax.random.normal(key, (3, fan_out)) * (np.sqrt(2) / np.sqrt(fan_out))
            )
            return w
        if layer in skip_in:
            w = jax.random.normal(key, shape) * (np.sqrt(2) / np.sqrt(fan_out))
            # zero the columns fed by the skipped encoding features (all of
            # the re-concatenated input except the raw xyz)
            w = w.at[-(in_dim0 - 3):, :].set(0.0)
            return w
        return jax.random.normal(key, shape) * (np.sqrt(2) / np.sqrt(fan_out))

    def bias_init(key, shape):
        if layer == last:
            val = bias if inside_outside else -bias
            return jnp.full(shape, val)
        return jnp.zeros(shape)

    return kernel, bias_init


def kaiming_uniform_init(key, shape, dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_ defaults (a=0 -> leaky_relu gain
    sqrt(2)): U(-sqrt(6/fan_in), sqrt(6/fan_in)). shape = [fan_in, fan_out]."""
    fan_in = shape[0]
    bound = np.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class _DenseParams(nn.Module):
    """Creates kernel/bias with the same tree structure and initializers as
    ``nn.Dense`` (so fused and unfused MLP paths share checkpoints) but
    returns the raw arrays instead of computing."""

    features: int

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_dim, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def _activation_name(fn: Optional[Callable]) -> Optional[str]:
    """Map an activation callable onto a fused-kernel name (None if the
    fused kernel doesn't support it)."""
    if fn is None:
        return "none"
    if fn is jax.nn.relu:
        return "relu"
    if fn is softplus_beta100:
        return "softplus100"
    return None


def use_fused_mlp_default() -> bool:
    """Fused Pallas MLP is the default on real TPU backends only — on CPU the
    Pallas interpreter would be far slower than XLA's native path.
    ``SST_DISABLE_FUSED_MLP=1`` disables it (A/B benchmarking escape hatch)."""
    import os

    if os.environ.get("SST_DISABLE_FUSED_MLP"):
        return False
    return jax.default_backend() == "tpu"


class MLP(nn.Module):
    """Generic MLP with skip connections (reference field_components/mlp.py:27-99).

    On TPU (``fused=None`` auto-resolves via :func:`use_fused_mlp_default`)
    skip-free MLPs with relu/softplus100 activations execute as ONE Pallas
    kernel (:mod:`sdfstudio_tpu.ops.pallas_mlp`) with all weights resident in
    VMEM — the tiny-cuda-nn ``FullyFusedMLP`` equivalent. The parameter tree
    is identical in both modes.
    """

    num_layers: int
    layer_width: int
    out_dim: Optional[int] = None
    skip_connections: Sequence[int] = ()
    activation: Callable = jax.nn.relu
    out_activation: Optional[Callable] = None
    fused: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        skips = set(self.skip_connections)
        params = []
        in_dim = x.shape[-1]
        for i in range(self.num_layers):
            if i in skips and i > 0:
                in_dim = x.shape[-1] + self.layer_width
            width = (
                self.layer_width
                if i < self.num_layers - 1
                else (self.out_dim or self.layer_width)
            )
            params.append(_DenseParams(width, name=f"layer_{i}")(in_dim))
            in_dim = width

        act_name = _activation_name(self.activation)
        out_act_name = _activation_name(self.out_activation)
        fused = self.fused if self.fused is not None else use_fused_mlp_default()
        if fused and not skips and act_name is not None and out_act_name is not None:
            from sdfstudio_tpu.ops.pallas_mlp import fused_mlp

            ws = [k for k, _ in params]
            bs = [b for _, b in params]
            return fused_mlp(x, ws, bs, activation=act_name, out_activation=out_act_name)

        inputs = x
        for i in range(self.num_layers - 1):
            if i in skips and i > 0:
                x = jnp.concatenate([inputs, x], axis=-1)
            k, b = params[i]
            x = jnp.dot(x, k, preferred_element_type=x.dtype) + b
            x = self.activation(x)
        k, b = params[-1]
        x = jnp.dot(x, k, preferred_element_type=x.dtype) + b
        if self.out_activation is not None:
            x = self.out_activation(x)
        return x
