"""Nerfacto-style grid field (hash encoding + fused MLPs), used both as the
"grid" background model of surface methods and as the nerfacto model field.

Functional spec: reference nerfstudio/fields/nerfacto_field.py:67-320
(TCNNNerfactoField). Optional transient / semantic / pred-normal heads are
mirrored; the SH direction encoding replaces tcnn's SphericalHarmonics.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from sdfstudio_tpu.core.rays import RaySamples
from sdfstudio_tpu.utils import checks
from sdfstudio_tpu.core.scene_box import SceneBox
from sdfstudio_tpu.ops.contraction import contract
from sdfstudio_tpu.ops.density import trunc_exp
from sdfstudio_tpu.ops.encodings import HashEncoding, NeRFEncoding, SHEncoding
from sdfstudio_tpu.ops.mlp import MLP


class NerfactoFieldNet(nn.Module):
    """Hash-grid density + view-dependent color networks."""

    num_images: int = 1
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_levels: int = 16
    max_res: int = 1024
    base_res: int = 16
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    appearance_embedding_dim: int = 32
    use_appearance_embedding: bool = True
    use_transient_embedding: bool = False
    transient_embedding_dim: int = 16
    num_layers_transient: int = 2
    hidden_dim_transient: int = 64
    use_semantics: bool = False
    num_semantic_classes: int = 100
    use_pred_normals: bool = False

    def setup(self):
        self.encoding = HashEncoding(
            num_levels=self.num_levels,
            min_res=self.base_res,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
        )
        self.mlp_base = MLP(
            num_layers=self.num_layers,
            layer_width=self.hidden_dim,
            out_dim=1 + self.geo_feat_dim,
        )
        self.direction_encoding = SHEncoding(levels=4)
        self.position_encoding = NeRFEncoding(
            in_dim=3, num_frequencies=2, min_freq_exp=0.0, max_freq_exp=1.0
        )
        self.embedding_appearance = nn.Embed(self.num_images, self.appearance_embedding_dim)
        self.mlp_head = MLP(
            num_layers=self.num_layers_color,
            layer_width=self.hidden_dim_color,
            out_dim=3,
            out_activation=jax.nn.sigmoid,
        )
        if self.use_transient_embedding:
            self.embedding_transient = nn.Embed(self.num_images, self.transient_embedding_dim)
            self.mlp_transient = MLP(
                num_layers=self.num_layers_transient,
                layer_width=self.hidden_dim_transient,
                out_dim=self.hidden_dim_transient,
            )
            self.head_transient_uncertainty = nn.Dense(1)
            self.head_transient_rgb = nn.Dense(3)
            self.head_transient_density = nn.Dense(1)
        if self.use_semantics:
            self.mlp_semantics = MLP(num_layers=2, layer_width=64, out_dim=64)
            self.head_semantics = nn.Dense(self.num_semantic_classes)
        if self.use_pred_normals:
            self.mlp_pred_normals = MLP(num_layers=3, layer_width=64, out_dim=64)
            self.head_pred_normals = nn.Dense(3)

    def density_raw(self, positions01: jnp.ndarray):
        checks.check_positions(positions01, "NerfactoField positions01")
        h = self.mlp_base(self.encoding(positions01))
        return h[..., 0], h[..., 1:]

    def __call__(
        self,
        positions01: jnp.ndarray,  # [..., 3] normalized positions
        directions: jnp.ndarray,  # [..., 3]
        camera_indices: jnp.ndarray,  # [...] int32
        train: bool = True,
        use_average_appearance: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        raw_density, geo_feat = self.density_raw(positions01)
        density = trunc_exp(raw_density)

        d = self.direction_encoding(directions)
        if not self.use_appearance_embedding:
            emb = jnp.zeros(
                (*directions.shape[:-1], self.appearance_embedding_dim), directions.dtype
            )
        elif train:
            emb = self.embedding_appearance(camera_indices)
        elif use_average_appearance:
            emb = jnp.broadcast_to(
                jnp.mean(self.embedding_appearance.embedding, axis=0),
                (*directions.shape[:-1], self.appearance_embedding_dim),
            )
        else:
            emb = jnp.zeros(
                (*directions.shape[:-1], self.appearance_embedding_dim), directions.dtype
            )

        out = {"density": density}

        if self.use_transient_embedding and train:
            temb = self.embedding_transient(camera_indices)
            t = self.mlp_transient(jnp.concatenate([geo_feat, temb], axis=-1))
            out["transient_uncertainty"] = jax.nn.softplus(self.head_transient_uncertainty(t))[..., 0]
            out["transient_rgb"] = jax.nn.sigmoid(self.head_transient_rgb(t))
            out["transient_density"] = trunc_exp(self.head_transient_density(t))[..., 0]
        if self.use_semantics:
            s = self.mlp_semantics(jax.lax.stop_gradient(geo_feat))
            out["semantics"] = self.head_semantics(s)
        if self.use_pred_normals:
            pe = self.position_encoding(positions01)
            n = self.mlp_pred_normals(jnp.concatenate([geo_feat, pe], axis=-1))
            pred = self.head_pred_normals(n)
            out["pred_normals"] = pred / jnp.maximum(
                jnp.linalg.norm(pred, axis=-1, keepdims=True), 1e-10
            )

        rgb = self.mlp_head(jnp.concatenate([d, geo_feat, emb], axis=-1))
        out["rgb"] = rgb
        return out


@dataclasses.dataclass
class NerfactoField:
    """Wrapper: aabb/contraction handling + pure closures."""

    aabb: Optional[jnp.ndarray] = None
    spatial_distortion: Optional[str] = "inf"  # None | inf | l2
    num_images: int = 1
    use_average_appearance_embedding: bool = False
    num_levels: int = 16
    max_res: int = 1024
    log2_hashmap_size: int = 19
    use_appearance_embedding: bool = True
    use_transient_embedding: bool = False
    use_semantics: bool = False
    num_semantic_classes: int = 100
    use_pred_normals: bool = False

    def __post_init__(self):
        self.module = NerfactoFieldNet(
            num_images=self.num_images,
            num_levels=self.num_levels,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            use_appearance_embedding=self.use_appearance_embedding,
            use_transient_embedding=self.use_transient_embedding,
            use_semantics=self.use_semantics,
            num_semantic_classes=self.num_semantic_classes,
            use_pred_normals=self.use_pred_normals,
        )

    def init(self, rng) -> FrozenDict:
        return self.module.init(
            rng,
            jnp.zeros((8, 3)),
            jnp.ones((8, 3)) / jnp.sqrt(3.0),
            jnp.zeros((8,), jnp.int32),
        )["params"]

    def normalize(self, positions: jnp.ndarray) -> jnp.ndarray:
        """Contract + map to [0,1] (reference nerfacto_field.py:225-231)."""
        if self.spatial_distortion == "inf":
            return (contract(positions, order=jnp.inf) + 2.0) / 4.0
        if self.spatial_distortion == "l2":
            return (contract(positions, order=None) + 2.0) / 4.0
        return SceneBox.get_normalized_positions(positions, self.aabb)

    def density_fn(self, params):
        def fn(positions):
            p01 = self.normalize(positions)
            raw, _ = self.module.apply(
                {"params": params}, p01, method=NerfactoFieldNet.density_raw
            )
            return trunc_exp(raw)

        return fn

    def get_outputs(
        self, params, ray_samples: RaySamples, train: bool = True, use_mid_points: bool = True
    ) -> Dict[str, jnp.ndarray]:
        """Evaluate rgb+density on ray samples. Uses mid (frustum center)
        positions like the reference background path."""
        R, S = ray_samples.num_rays, ray_samples.num_samples
        pts = ray_samples.get_positions() if use_mid_points else ray_samples.get_start_positions()
        p01 = self.normalize(pts.reshape(-1, 3))
        dirs = jnp.broadcast_to(ray_samples.directions[:, None, :], (R, S, 3)).reshape(-1, 3)
        if ray_samples.camera_indices is not None:
            cam = jnp.broadcast_to(ray_samples.camera_indices[:, None], (R, S)).reshape(-1)
        else:
            cam = jnp.zeros((R * S,), jnp.int32)
        out = self.module.apply(
            {"params": params}, p01, dirs, cam, train, self.use_average_appearance_embedding
        )
        return jax.tree_util.tree_map(lambda x: x.reshape(R, S, *x.shape[1:]), out)
