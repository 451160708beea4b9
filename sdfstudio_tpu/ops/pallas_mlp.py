"""Fully-fused MLP as a Pallas TPU kernel.

This is the TPU-native equivalent of tiny-cuda-nn's ``FullyFusedMLP``
(reference call sites: nerfstudio/fields/density_fields.py:89,
nerfstudio/fields/nerfacto_field.py:127-221, fields/sdf_field.py:230): the
whole layer chain executes in one kernel with every weight matrix resident
in VMEM, so the inter-layer activations never round-trip through HBM.

Why this wins: at neus-facto scale a proposal-field MLP evaluates ~7e5
points/step through 64-wide layers.  Each layer boundary in the unfused XLA
program writes + reads an ``[N, 64]`` f32 activation buffer in HBM; the
matmul FLOPs themselves are ~100x cheaper than that traffic on the MXU.
Fusing the chain leaves exactly one read of ``x`` and one write of ``y`` per
block.

Semantics
---------
``fused_mlp(x, weights, biases, activation=..., out_activation=...)`` is
numerically identical (modulo f32 matmul precision settings) to::

    h = x
    for W, b in zip(weights[:-1], biases[:-1]):
        h = act(h @ W + b)
    y = out_act(h @ weights[-1] + biases[-1])

It is differentiable via a custom VJP whose backward pass is a second
Pallas kernel (recompute-forward-in-VMEM, then backprop; dW/db are
accumulated across the sequential TPU grid into constant-index output
blocks).  NOTE: custom_vjp means **forward-mode (jvp) through this op is
unavailable** — the SDF geometry network (which needs JVP for eikonal
gradients, see fields/sdf_field.py) must keep plain matmuls; this kernel is
for the proposal/density/color/background nets and inference paths.

All feature dims are zero-padded to multiples of 128 lanes (the f32 tile is
(8, 128)); rows are processed in blocks of ``block_rows``.  Padding columns
are mathematically inert: padded weights/bias entries are zero and the
activations are applied to whole padded tiles (relu/softplus(0)=0 keeps the
padding zero; for activations with act(0) != 0, correctness still holds
because subsequent weight rows for padded features are zero).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

# Mosaic does not support the session-level "high" (bf16_3x) matmul
# precision; pin an explicit precision inside kernels — surface methods keep
# f32 semantics (reference method_configs.py: mixed_precision=False) and the
# kernel is HBM-bound, so the extra MXU passes of HIGHEST are usually not
# the bottleneck. SST_FUSED_MLP_PRECISION=default selects single-pass bf16.
import os as _os

_DOT_PRECISION = (
    jax.lax.Precision.DEFAULT
    if _os.environ.get("SST_FUSED_MLP_PRECISION", "highest") == "default"
    else jax.lax.Precision.HIGHEST
)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Activations are identified by name so the kernel closures stay hashable /
# cacheable; each entry is (forward, derivative-from-preactivation).
def _softplus100(x):
    return jax.nn.softplus(100.0 * x) * 0.01


def _softplus100_grad(x):
    return jax.nn.sigmoid(100.0 * x)


_ACTIVATIONS = {
    "relu": (jax.nn.relu, lambda x: (x > 0).astype(x.dtype)),
    "softplus100": (_softplus100, _softplus100_grad),
    "none": (lambda x: x, lambda x: jnp.ones_like(x)),
}


def _pad2(a: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))


def _fwd_kernel(n_layers: int, act_name: str, out_act_name: str, *refs):
    x_ref = refs[0]
    w_refs = refs[1 : 1 + n_layers]
    b_refs = refs[1 + n_layers : 1 + 2 * n_layers]
    y_ref = refs[1 + 2 * n_layers]
    act = _ACTIVATIONS[act_name][0]
    out_act = _ACTIVATIONS[out_act_name][0]
    h = x_ref[:]
    for i in range(n_layers):
        h = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32, precision=_DOT_PRECISION) + b_refs[i][:]
        h = act(h) if i < n_layers - 1 else out_act(h)
    y_ref[:] = h


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def _fused_mlp_padded(x, ws, bs, act_name, out_act_name, block_rows, interpret):
    y, _ = _fused_mlp_padded_fwd(
        x, ws, bs, act_name, out_act_name, block_rows, interpret
    )
    return y


def _fused_mlp_padded_fwd(x, ws, bs, act_name, out_act_name, block_rows, interpret):
    n_layers = len(ws)
    n, d_in = x.shape
    d_out = ws[-1].shape[1]
    grid = (n // block_rows,)
    in_specs = [
        pl.BlockSpec((block_rows, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    for w in ws:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    for b in bs:
        in_specs.append(
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers, act_name, out_act_name),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_rows, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, d_out), jnp.float32),
        interpret=interpret,
    )(x, *ws, *bs)
    return y, (x, ws, bs)


def _fused_mlp_padded_bwd(act_name, out_act_name, block_rows, interpret, res, g):
    x, ws, bs = res
    n_layers = len(ws)
    n, d_in = x.shape
    d_out = ws[-1].shape[1]
    grid = (n // block_rows,)

    def kernel(*refs):
        x_ref = refs[0]
        w_refs = refs[1 : 1 + n_layers]
        b_refs = refs[1 + n_layers : 1 + 2 * n_layers]
        g_ref = refs[1 + 2 * n_layers]
        dx_ref = refs[2 + 2 * n_layers]
        dw_refs = refs[3 + 2 * n_layers : 3 + 3 * n_layers]
        db_refs = refs[3 + 3 * n_layers : 3 + 4 * n_layers]

        act, act_grad = _ACTIVATIONS[act_name]
        _, out_act_grad = _ACTIVATIONS[out_act_name]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for i in range(n_layers):
                dw_refs[i][:] = jnp.zeros_like(dw_refs[i])
                db_refs[i][:] = jnp.zeros_like(db_refs[i])

        h = x_ref[:]
        acts = [h]
        pres = []
        for i in range(n_layers):
            pre = (
                jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32, precision=_DOT_PRECISION)
                + b_refs[i][:]
            )
            pres.append(pre)
            if i < n_layers - 1:
                h = act(pre)
                acts.append(h)

        d = g_ref[:] * out_act_grad(pres[-1])
        for i in range(n_layers - 1, -1, -1):
            dw_refs[i][:] += jnp.dot(
                acts[i].T, d, preferred_element_type=jnp.float32,
                precision=_DOT_PRECISION,
            )
            db_refs[i][:] += jnp.sum(d, axis=0, keepdims=True)
            if i > 0:
                d = jnp.dot(d, w_refs[i][:].T, preferred_element_type=jnp.float32, precision=_DOT_PRECISION)
                d = d * act_grad(pres[i - 1])
        dx_ref[:] = jnp.dot(d, w_refs[0][:].T, preferred_element_type=jnp.float32, precision=_DOT_PRECISION)

    in_specs = [
        pl.BlockSpec((block_rows, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    in_specs.append(
        pl.BlockSpec((block_rows, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )
    out_shapes = (
        [jax.ShapeDtypeStruct((n, d_in), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs]
    )
    out_specs = (
        [pl.BlockSpec((block_rows, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in ws]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for b in bs]
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x, *ws, *bs, g)
    dx = outs[0]
    dws = tuple(outs[1 : 1 + n_layers])
    dbs = tuple(outs[1 + n_layers :])
    return dx, dws, dbs


_fused_mlp_padded.defvjp(_fused_mlp_padded_fwd, _fused_mlp_padded_bwd)


def fused_mlp(
    x: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    activation: str = "relu",
    out_activation: str = "none",
    block_rows: int = 1024,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Evaluate the MLP ``act(x@W0+b0) ... @Wn+bn`` in one Pallas kernel.

    Args:
        x: ``[..., d_in]`` float32 inputs.
        weights: per-layer ``[d_i, d_{i+1}]`` kernels.
        biases: per-layer ``[d_{i+1}]`` biases.
        activation / out_activation: one of ``relu|softplus100|none``.
        block_rows: rows per grid step (multiple of 8).
        interpret: force interpreter mode (defaults to True off-TPU).

    Returns ``[..., d_out]``. Differentiable (reverse mode only).
    """
    if activation not in _ACTIVATIONS or out_activation not in _ACTIVATIONS:
        raise ValueError(f"unsupported activation {activation}/{out_activation}")
    for i, w in enumerate(weights):
        expected = x.shape[-1] if i == 0 else weights[i - 1].shape[1]
        if w.shape[0] != expected:
            raise ValueError(
                f"fused_mlp layer {i}: kernel in_dim {w.shape[0]} != {expected}"
            )
    if interpret is None:
        interpret = _interpret_default()
    batch = x.shape[:-1]
    d_in = x.shape[-1]
    d_out = weights[-1].shape[-1]
    n = int(np.prod(batch)) if batch else 1
    x2 = x.reshape(n, d_in).astype(jnp.float32)

    # pad dims to LANE, rows to block_rows
    dims = [d_in] + [w.shape[1] for w in weights]
    pdims = [_round_up(d, LANE) for d in dims]

    # Adaptive block_rows: the backward kernel holds x, g, dx, every
    # activation + preactivation, and double-buffered streamed blocks in
    # VMEM at once. A fixed 1024 overflowed the 16MB scoped-vmem limit by
    # 12KB for the [N, 384->256->256->128] color net (compile-time OOM on
    # v5e), so size the block from an estimate with headroom.
    fixed_bytes = 8 * sum(pd_i * pd_o for pd_i, pd_o in zip(pdims[:-1], pdims[1:]))
    per_row_bytes = 4 * (2 * (pdims[0] + pdims[-1] + pdims[0]) + 2 * sum(pdims))
    budget = 12 * 1024 * 1024
    while block_rows > 8 and fixed_bytes + per_row_bytes * block_rows > budget:
        block_rows //= 2
    n_pad = _round_up(max(n, 1), block_rows)
    x2 = jnp.pad(x2, ((0, n_pad - n), (0, pdims[0] - d_in)))
    ws = [
        _pad2(w.astype(jnp.float32), pdims[i], pdims[i + 1])
        for i, w in enumerate(weights)
    ]
    bs = [
        jnp.pad(b.astype(jnp.float32), (0, pdims[i + 1] - b.shape[0])).reshape(1, -1)
        for i, b in enumerate(biases)
    ]
    y = _fused_mlp_padded(
        x2, tuple(ws), tuple(bs), activation, out_activation, block_rows, interpret
    )
    return y[:n, :d_out].reshape(*batch, d_out)
