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


def compute_dtype() -> jnp.dtype:
    """Activation/compute dtype for field MLPs: bfloat16 on TPU, float32
    elsewhere (CPU bf16 is emulated and slow, and tests want exact math).

    The train step is HBM-traffic-bound — MLP activations at ~100k-sample
    scale dominate the measured 45 GB/step — so halving activation bytes is
    a direct throughput win. This mirrors the reference, which trains its
    field networks in fp16 inside tiny-cuda-nn (sdf_field.py:230).
    Parameters and optimizer state stay float32 (mixed precision): casts are
    applied at use sites and gradients accumulate in f32 through the cast
    transpose. ``SST_MLP_DTYPE={float32,bfloat16}`` overrides.
    """
    import os

    env = os.environ.get("SST_MLP_DTYPE")
    if env:
        return jnp.dtype(env)
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


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
    # head layers (sdf / rgb outputs) set this: keeps the f32 accumulator
    # instead of rounding to the bf16 compute dtype — NeuS alphas difference
    # adjacent sdf samples, where bf16 cancellation is visible
    out_f32: bool = False

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
        cdt = compute_dtype()
        y = jnp.dot(
            x.astype(cdt), kernel.astype(cdt), preferred_element_type=jnp.float32
        )
        return y + b if self.out_f32 else (y + b).astype(cdt)


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
    """Whether MLPs route through the Pallas fully-fused kernel by default.

    Off by default everywhere: A/B on the real TPU showed the XLA path is
    slightly FASTER for the train step (261 vs 270 ms/step on the full-size
    neus-facto-tpu config) — the custom-calls block XLA fusion across layer
    boundaries and Mosaic forces 128-lane padding (hidden-64 proposal MLPs
    ran as padded [N,128] buffers, ~2x their real traffic). The kernel also
    pins f32 while the XLA path runs bf16 mixed precision (compute_dtype).
    ``SST_ENABLE_FUSED_MLP=1`` re-enables on TPU for benchmarking."""
    import os

    if os.environ.get("SST_ENABLE_FUSED_MLP"):
        return jax.default_backend() == "tpu"
    return False


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

        cdt = compute_dtype()
        inputs = x = x.astype(cdt)
        for i in range(self.num_layers - 1):
            if i in skips and i > 0:
                x = jnp.concatenate([inputs, x], axis=-1)
            k, b = params[i]
            x = jnp.dot(x, k.astype(cdt), preferred_element_type=jnp.float32) + b
            x = self.activation(x).astype(cdt)
        k, b = params[-1]
        # final layer accumulates and returns f32: heads (density, rgb) feed
        # exp/sigmoid and the losses, which want full precision
        x = jnp.dot(x, k.astype(cdt), preferred_element_type=jnp.float32) + b
        if self.out_activation is not None:
            x = self.out_activation(x)
        return x
