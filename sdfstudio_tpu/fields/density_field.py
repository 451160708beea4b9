"""Proposal density field (hash grid + tiny MLP).

Functional spec: reference nerfstudio/fields/density_fields.py:40-121
(HashMLPDensityField over tcnn NetworkWithInputEncoding). On TPU the
encoding gather + 2-layer MLP + trunc_exp fuse under jit — the moral
equivalent of tcnn's fused path.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

import jax

from sdfstudio_tpu.core.scene_box import SceneBox
from sdfstudio_tpu.ops.contraction import contract
from sdfstudio_tpu.ops.density import trunc_exp
from sdfstudio_tpu.ops.encodings import HashEncoding
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

    @nn.compact
    def __call__(self, positions01: jnp.ndarray) -> jnp.ndarray:
        """positions01 in [0,1]^3 -> raw (pre-activation) density [...]."""
        enc = HashEncoding(
            num_levels=self.num_levels,
            min_res=self.base_res,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
        )(positions01)
        if self.use_linear:
            raw = nn.Dense(1)(enc)
        else:
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

    def __post_init__(self):
        self.module = HashMLPDensityFieldNet(
            num_layers=self.num_layers,
            hidden_dim=self.hidden_dim,
            use_linear=self.use_linear,
            num_levels=self.num_levels,
            max_res=self.max_res,
            base_res=self.base_res,
            log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
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
