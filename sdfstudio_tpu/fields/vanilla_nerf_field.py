"""Classic NeRF field (PE + MLP), used as the "mlp" background model and as
the vanilla-nerf/mipnerf model field.

Functional spec: reference nerfstudio/fields/vanilla_nerf_field.py:37-120.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from sdfstudio_tpu.core.rays import RaySamples
from sdfstudio_tpu.core.math import conical_frustum_to_gaussian
from sdfstudio_tpu.ops.contraction import contract
from sdfstudio_tpu.ops.encodings import NeRFEncoding
from sdfstudio_tpu.ops.mlp import MLP


class NeRFFieldNet(nn.Module):
    """Base MLP (density) + head MLP (rgb)."""

    position_frequencies: int = 10
    direction_frequencies: int = 4
    base_mlp_num_layers: int = 8
    base_mlp_layer_width: int = 256
    head_mlp_num_layers: int = 2
    head_mlp_layer_width: int = 128
    skip_connections: tuple = (4,)

    def setup(self):
        self.position_encoding = NeRFEncoding(
            in_dim=3,
            num_frequencies=self.position_frequencies,
            min_freq_exp=0.0,
            max_freq_exp=self.position_frequencies - 1.0,
            include_input=True,
        )
        self.direction_encoding = NeRFEncoding(
            in_dim=3,
            num_frequencies=self.direction_frequencies,
            min_freq_exp=0.0,
            max_freq_exp=self.direction_frequencies - 1.0,
            include_input=True,
        )
        self.mlp_base = MLP(
            num_layers=self.base_mlp_num_layers,
            layer_width=self.base_mlp_layer_width,
            skip_connections=self.skip_connections,
            out_activation=jax.nn.relu,
        )
        self.mlp_head = MLP(
            num_layers=self.head_mlp_num_layers,
            layer_width=self.head_mlp_layer_width,
            out_activation=jax.nn.relu,
        )
        self.density_head = nn.Dense(1)
        self.rgb_head = nn.Dense(3)

    def density(self, positions: jnp.ndarray, covs: Optional[jnp.ndarray] = None):
        encoded = self.position_encoding(positions, covs=covs)
        base = self.mlp_base(encoded)
        density = jax.nn.softplus(self.density_head(base))[..., 0]
        return density, base

    def __call__(
        self,
        positions: jnp.ndarray,
        directions: jnp.ndarray,
        covs: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        density, base = self.density(positions, covs=covs)
        d = self.direction_encoding(directions)
        head = self.mlp_head(jnp.concatenate([d, base], axis=-1))
        rgb = jax.nn.sigmoid(self.rgb_head(head))
        return {"density": density, "rgb": rgb}


@dataclasses.dataclass
class NeRFField:
    """Wrapper with contraction + ray-sample evaluation."""

    spatial_distortion: Optional[str] = None  # None | inf | l2
    use_integrated_encoding: bool = False
    position_frequencies: int = 10
    direction_frequencies: int = 4
    base_mlp_num_layers: int = 8
    base_mlp_layer_width: int = 256
    head_mlp_num_layers: int = 2
    head_mlp_layer_width: int = 128

    def __post_init__(self):
        self.module = NeRFFieldNet(
            position_frequencies=self.position_frequencies,
            direction_frequencies=self.direction_frequencies,
            base_mlp_num_layers=self.base_mlp_num_layers,
            base_mlp_layer_width=self.base_mlp_layer_width,
            head_mlp_num_layers=self.head_mlp_num_layers,
            head_mlp_layer_width=self.head_mlp_layer_width,
        )

    def init(self, rng) -> FrozenDict:
        return self.module.init(
            rng, jnp.zeros((8, 3)), jnp.ones((8, 3)) / jnp.sqrt(3.0)
        )["params"]

    def contract_positions(self, x):
        if self.spatial_distortion == "inf":
            return contract(x, order=jnp.inf)
        if self.spatial_distortion == "l2":
            return contract(x, order=None)
        return x

    def get_outputs(self, params, ray_samples: RaySamples, train: bool = True) -> Dict:
        R, S = ray_samples.num_rays, ray_samples.num_samples
        dirs = jnp.broadcast_to(ray_samples.directions[:, None, :], (R, S, 3)).reshape(-1, 3)
        if self.use_integrated_encoding:
            radius = jnp.sqrt(ray_samples.pixel_area) / 1.7724538509055159
            g = conical_frustum_to_gaussian(
                ray_samples.origins[:, None, :],
                ray_samples.directions[:, None, :],
                ray_samples.starts[..., None],
                ray_samples.ends[..., None],
                radius[:, None, :],
            )
            pts = self.contract_positions(g.mean).reshape(-1, 3)
            covs = g.cov.reshape(-1, 3, 3)
            out = self.module.apply({"params": params}, pts, dirs, covs)
        else:
            pts = self.contract_positions(ray_samples.get_positions()).reshape(-1, 3)
            out = self.module.apply({"params": params}, pts, dirs)
        return jax.tree_util.tree_map(lambda x: x.reshape(R, S, *x.shape[1:]), out)

    def density_fn(self, params):
        def fn(positions):
            p = self.contract_positions(positions)
            density, _ = self.module.apply(
                {"params": params}, p, method=NeRFFieldNet.density
            )
            return density

        return fn
