"""Proposal density fields.

Functional spec: reference nerfstudio/fields/density_fields.py:40-121
(HashMLPDensityField over tcnn NetworkWithInputEncoding). On TPU the
encoding gather + 2-layer MLP + trunc_exp fuse under jit — the moral
equivalent of tcnn's fused path.

TPU-native addition: ``field_type="mlp"`` replaces the hash grid with a
positional-encoded MLP (the proposal design of the original mip-NeRF 360,
which nerfacto swapped for a hash grid because tcnn made gathers cheap on
GPU). On TPU the economics invert — the neus-facto proposal stage costs
~35M random table rows/step through the hash path (measured the dominant
cost at ~160M rows/s gather ceiling) while a PE+MLP of the same capacity is
a few GFLOP of MXU work (<1 ms). Density-only proposals need smooth coarse
structure, not hash-grid detail; quality parity is validated in
tests/test_models.py and the synthetic-scene benchmarks.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

import jax

from sdfstudio_tpu.core.scene_box import SceneBox
from sdfstudio_tpu.utils import checks
from sdfstudio_tpu.ops.contraction import contract
from sdfstudio_tpu.ops.density import trunc_exp
from sdfstudio_tpu.ops.encodings import HashEncoding, NeRFEncoding
from sdfstudio_tpu.ops.mlp import MLP


class HashMLPDensityFieldNet(nn.Module):
    """Density-only network: hash encode -> MLP -> trunc_exp."""

    num_layers: int = 2
    hidden_dim: int = 64
    use_linear: bool = False
    num_levels: int = 8
    max_res: int = 1024
    base_res: int = 16
    log2_hashmap_size: int = 18
    features_per_level: int = 2
    table_dtype: str = "float32"

    @nn.compact
    def __call__(self, positions01: jnp.ndarray) -> jnp.ndarray:
        """positions01 in [0,1]^3 -> raw (pre-activation) density [...]."""
        checks.check_positions(positions01, "HashMLPDensityField positions01")
        enc = HashEncoding(
            num_levels=self.num_levels,
            min_res=self.base_res,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
            table_dtype=self.table_dtype,
        )(positions01)
        if self.use_linear:
            raw = nn.Dense(1)(enc)
        else:
            raw = MLP(num_layers=self.num_layers, layer_width=self.hidden_dim, out_dim=1)(enc)
        return raw[..., 0]


class MLPDensityFieldNet(nn.Module):
    """Gather-free proposal density: NeRF positional encoding + MLP.

    The frequency count tracks the hash variant's max_res so the two
    field_types are interchangeable per proposal level (freq 2^k resolves
    ~2^k cells across the scene box)."""

    num_layers: int = 3
    hidden_dim: int = 64
    num_frequencies: int = 6

    @nn.compact
    def __call__(self, positions01: jnp.ndarray) -> jnp.ndarray:
        """positions01 in [0,1]^3 -> raw (pre-activation) density [...]."""
        x = positions01 * 2.0 - 1.0
        enc = NeRFEncoding(
            in_dim=3,
            num_frequencies=self.num_frequencies,
            min_freq_exp=0.0,
            max_freq_exp=float(self.num_frequencies - 1),
            include_input=True,
        )(x)
        raw = MLP(num_layers=self.num_layers, layer_width=self.hidden_dim, out_dim=1)(enc)
        return raw[..., 0]


@dataclasses.dataclass
class HashMLPDensityField:
    """Wrapper bundling module + aabb/distortion handling
    (reference density_fields.py:99-117)."""

    aabb: Optional[jnp.ndarray] = None  # [2, 3]
    spatial_distortion: Optional[str] = None  # None | "inf" | "l2"
    num_layers: int = 2
    hidden_dim: int = 64
    use_linear: bool = False
    num_levels: int = 8
    max_res: int = 1024
    base_res: int = 16
    log2_hashmap_size: int = 18
    features_per_level: int = 2
    field_type: str = "hash"  # hash | mlp (TPU-native gather-free variant)
    table_dtype: str = "float32"

    def __post_init__(self):
        if self.field_type == "mlp":
            # frequencies sized to the level's max_res analog
            import math as _math

            # hidden_dim floors at 64: hash configs use tiny MLP heads (16)
            # because the grid carries the capacity; here the MLP is the field
            self.module = MLPDensityFieldNet(
                num_layers=max(self.num_layers, 3),
                hidden_dim=max(self.hidden_dim, 64),
                num_frequencies=max(4, min(int(_math.log2(self.max_res)), 9)),
            )
        else:
            self.module = HashMLPDensityFieldNet(
                num_layers=self.num_layers,
                hidden_dim=self.hidden_dim,
                use_linear=self.use_linear,
                num_levels=self.num_levels,
                max_res=self.max_res,
                base_res=self.base_res,
                log2_hashmap_size=self.log2_hashmap_size,
                features_per_level=self.features_per_level,
                table_dtype=self.table_dtype,
            )

    def init(self, rng) -> FrozenDict:
        return self.module.init(rng, jnp.zeros((8, 3)))["params"]

    def normalize(self, positions: jnp.ndarray) -> jnp.ndarray:
        if self.spatial_distortion == "inf":
            return (contract(positions, order=jnp.inf) + 2.0) / 4.0
        if self.spatial_distortion == "l2":
            return (contract(positions, order=None) + 2.0) / 4.0
        return SceneBox.get_normalized_positions(positions, self.aabb)

    def density_fn(self, params):
        """positions [..., 3] -> density [...] (what the proposal sampler
        consumes, ray_samplers.py:567)."""

        def fn(positions):
            p01 = self.normalize(positions)
            raw = self.module.apply({"params": params}, p01)
            return trunc_exp(raw)

        return fn
