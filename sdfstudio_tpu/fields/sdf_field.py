"""SDF field: geometry network with geometric init, grid features, density /
alpha conversions, and the view-dependent color network.

Functional spec: reference nerfstudio/fields/sdf_field.py:121-698. The
network is a flax.linen module (:class:`SDFFieldNet`); everything that
involves input gradients (eikonal / numerical gradients, NeuS alpha) lives
in free functions that close over ``(module, params)`` so that plain
``jax.grad`` provides the double backprop the reference gets from
``torch.autograd.grad(create_graph=True)`` (sdf_field.py:646-654).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import FrozenDict

from sdfstudio_tpu.core.math import safe_normalize
from sdfstudio_tpu.utils import checks
from sdfstudio_tpu.core.rays import RaySamples
from sdfstudio_tpu.ops import density as density_ops
from sdfstudio_tpu.ops.contraction import contract
from sdfstudio_tpu.ops.encodings import (
    HashEncoding,
    NeRFEncoding,
    PeriodicVolumeEncoding,
    TensorVMEncoding,
)
from sdfstudio_tpu.ops.mlp import (
    WNLinear,
    geometric_kernel_init,
    kaiming_uniform_init,
    softplus_beta100,
)

FieldParams = Any  # params pytree of SDFFieldNet


def analytic_sdf_gradient(
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray], x: jnp.ndarray, mode: str = "jvp"
) -> jnp.ndarray:
    """d sdf / d x for a per-point-independent sdf_fn ([N,3] -> [N]).

    mode="reverse"/"vjp": one backward pass via grad-of-sum (per-point sdf
    makes the sum-grad exact per point).
    mode="jvp": three forward-mode passes with basis tangents (XLA CSEs the
    shared primal); same values, different (TPU-compiler-friendly) program.
    """
    if mode in ("reverse", "vjp"):
        return jax.grad(lambda p: jnp.sum(sdf_fn(p)))(x)
    gs = []
    for i in range(3):
        tangent = jnp.zeros_like(x).at[..., i].set(1.0)
        _, gi = jax.jvp(sdf_fn, (x,), (tangent,))
        gs.append(gi)
    return jnp.stack(gs, axis=-1)


@dataclasses.dataclass(frozen=True)
class SDFFieldConfig:
    """Mirror of reference SDFFieldConfig (sdf_field.py:121-185)."""

    num_layers: int = 8
    hidden_dim: int = 256
    geo_feat_dim: int = 256
    num_layers_color: int = 4
    hidden_dim_color: int = 256
    appearance_embedding_dim: int = 32
    use_appearance_embedding: bool = False
    bias: float = 0.8
    geometric_init: bool = True
    inside_outside: bool = True
    weight_norm: bool = True
    use_grid_feature: bool = False
    divide_factor: float = 2.0
    beta_init: float = 0.1
    encoding_type: str = "hash"  # hash | permuto | periodic | tensorf_vm
    """"permuto" swaps the cubic hash grid for the permutohedral-lattice
    encoding (ops/permuto.py, PermutoSDF arXiv:2211.12562): 4 simplex
    corners per lookup instead of 8 — half the random table accesses, the
    measured TPU train-step bottleneck."""
    position_encoding_max_degree: int = 6
    use_diffuse_color: bool = False
    use_specular_tint: bool = False
    use_reflections: bool = False
    use_n_dot_v: bool = False
    rgb_padding: float = 0.001
    off_axis: bool = False
    use_numerical_gradients: bool = False
    num_levels: int = 16
    max_res: int = 2048
    base_res: int = 16
    log2_hashmap_size: int = 19
    hash_features_per_level: int = 2
    hash_smoothstep: bool = True
    hash_table_dtype: str = "float32"  # "bfloat16" = tcnn-style fp16-class tables
    use_position_encoding: bool = True
    analytic_gradient_mode: str = "vjp"  # vjp | jvp | reverse
    """How analytic SDF input-gradients are computed. "jvp" takes 3
    forward-mode passes (mathematically identical to reverse); it avoids a
    reverse-to-input pattern through the hash encoding that crashes the TPU
    compiler's fusion cost model (SIGILL in NormalizedComputationCost),
    and under the outer training grad becomes reverse-over-forward, which
    compiles cleanly."""


class SDFFieldNet(nn.Module):
    """The parametrized networks of the SDF field."""

    config: SDFFieldConfig
    num_images: int = 1

    def setup(self):
        cfg = self.config
        if cfg.encoding_type == "hash":
            self.encoding = HashEncoding(
                num_levels=cfg.num_levels,
                min_res=cfg.base_res,
                max_res=cfg.max_res,
                log2_hashmap_size=cfg.log2_hashmap_size,
                features_per_level=cfg.hash_features_per_level,
                smoothstep=cfg.hash_smoothstep,
                table_dtype=cfg.hash_table_dtype,
            )
            grid_dim = self.encoding.out_dim
        elif cfg.encoding_type == "permuto":
            from sdfstudio_tpu.ops.permuto import PermutoEncoding

            self.encoding = PermutoEncoding(
                num_levels=cfg.num_levels,
                min_res=cfg.base_res,
                max_res=cfg.max_res,
                log2_hashmap_size=cfg.log2_hashmap_size,
                features_per_level=cfg.hash_features_per_level,
                table_dtype=cfg.hash_table_dtype,
            )
            grid_dim = self.encoding.out_dim
        elif cfg.encoding_type == "periodic":
            self.encoding = PeriodicVolumeEncoding(
                num_levels=cfg.num_levels,
                min_res=cfg.base_res,
                max_res=cfg.max_res,
                log2_hashmap_size=18,
                features_per_level=cfg.hash_features_per_level,
                smoothstep=cfg.hash_smoothstep,
            )
            grid_dim = self.encoding.out_dim
        elif cfg.encoding_type == "tensorf_vm":
            self.encoding = TensorVMEncoding(128, 24, smoothstep=cfg.hash_smoothstep)
            grid_dim = self.encoding.out_dim
        else:
            raise ValueError(f"unknown encoding type {cfg.encoding_type}")
        self.grid_dim = grid_dim

        self.position_encoding = NeRFEncoding(
            in_dim=3,
            num_frequencies=cfg.position_encoding_max_degree,
            min_freq_exp=0.0,
            max_freq_exp=cfg.position_encoding_max_degree - 1,
            include_input=False,
            off_axis=cfg.off_axis,
        )
        self.direction_encoding = NeRFEncoding(
            in_dim=3, num_frequencies=4, min_freq_exp=0.0, max_freq_exp=3.0, include_input=True
        )

        # ---- geometry MLP (sdf_field.py:276-315) ----
        in_dim0 = 3 + self.position_encoding.out_dim + grid_dim
        dims = [in_dim0] + [cfg.hidden_dim] * cfg.num_layers + [1 + cfg.geo_feat_dim]
        n_glayers = len(dims) - 1  # layers 0 .. n_glayers-1
        # skip connection at layer 4 (sdf_field.py:282); only valid when that
        # layer exists as a hidden layer (shallow configs skip the skip)
        self.skip_in = tuple(s for s in (4,) if s < n_glayers)
        glayers = []
        for l in range(n_glayers):
            out_dim = dims[l + 1]
            if l + 1 in self.skip_in:
                out_dim = dims[l + 1] - dims[0]
            if cfg.geometric_init:
                kinit, binit = geometric_kernel_init(
                    layer=l,
                    num_hidden_layers=n_glayers - 1,
                    in_dim0=dims[0],
                    skip_in=self.skip_in,
                    bias=cfg.bias,
                    inside_outside=cfg.inside_outside,
                )
            else:
                kinit, binit = nn.initializers.lecun_normal(), nn.initializers.zeros
            glayers.append(
                WNLinear(
                    out_dim,
                    kernel_init=kinit,
                    bias_init=binit,
                    use_weight_norm=cfg.weight_norm,
                    # sdf head stays f32: NeuS alphas difference adjacent
                    # sdf samples (bf16 cancellation there is visible)
                    out_f32=(l == n_glayers - 1),
                    name=f"glin{l}",
                )
            )
        self.glayers = glayers
        self.geo_in_dim = dims[0]

        # ---- color MLP (sdf_field.py:331-363) ----
        if cfg.use_diffuse_color:
            color_in = (
                self.direction_encoding.out_dim
                + cfg.geo_feat_dim
                + cfg.appearance_embedding_dim
            )
        else:
            color_in = (
                3
                + self.direction_encoding.out_dim
                + 3
                + cfg.geo_feat_dim
                + cfg.appearance_embedding_dim
            )
        if cfg.use_n_dot_v:
            color_in += 1
        cdims = [color_in] + [cfg.hidden_dim_color] * cfg.num_layers_color + [3]
        clayers = []
        for l in range(len(cdims) - 1):
            clayers.append(
                WNLinear(
                    cdims[l + 1],
                    kernel_init=kaiming_uniform_init,
                    bias_init=nn.initializers.zeros,
                    use_weight_norm=cfg.weight_norm,
                    out_f32=(l == len(cdims) - 2),
                    name=f"clin{l}",
                )
            )
        self.clayers = clayers
        self.cdims = cdims

        if cfg.use_diffuse_color:
            self.diffuse_color_pred = nn.Dense(3, name="diffuse_color_pred")
        if cfg.use_specular_tint:
            self.specular_tint_pred = nn.Dense(3, name="specular_tint_pred")

        self.embedding_appearance = nn.Embed(
            self.num_images, cfg.appearance_embedding_dim, name="embedding_appearance"
        )

        # learnable density / deviation scalars (sdf_field.py:317-323)
        self.laplace_beta = self.param(
            "laplace_beta", lambda key: jnp.full((1,), self.config.beta_init)
        )
        self.deviation = self.param(
            "deviation", lambda key: jnp.full((1,), self.config.beta_init)
        )

    # ------------------------------------------------------------------
    def _geo_mlp(self, x: jnp.ndarray, feature: jnp.ndarray) -> jnp.ndarray:
        """The MLP part of the geonetwork, with the grid feature as an
        explicit input (so input-gradients can be chained analytically
        through the encode jacobian instead of jax.jvp through the table
        gather — see HashEncoding)."""
        cfg = self.config
        pe = self.position_encoding(x)
        if not cfg.use_position_encoding:
            pe = jnp.zeros_like(pe)

        inputs = jnp.concatenate([x, pe, feature], axis=-1)
        h = inputs
        n = len(self.glayers)
        for l in range(n):
            if l in self.skip_in:
                h = jnp.concatenate([h, inputs], axis=-1) / np.sqrt(2)
            h = self.glayers[l](h)
            if l < n - 1:
                h = softplus_beta100(h)
        return h

    def _grid_feature(
        self, x: jnp.ndarray, hash_mask: Optional[jnp.ndarray], want_jac: bool
    ):
        """Grid feature (and optionally its jacobian wrt x) at (possibly
        contracted) positions x in [-2, 2] (normalization sdf_field.py:384)."""
        cfg = self.config
        if not cfg.use_grid_feature:
            z = jnp.zeros((*x.shape[:-1], self.grid_dim), dtype=x.dtype)
            return (z, jnp.zeros((*z.shape, 3), dtype=x.dtype)) if want_jac else (z, None)
        positions = (x + 2.0) / 4.0  # sdf_field.py:384
        if want_jac and cfg.encoding_type in ("hash", "permuto"):
            feature, jac = self.encoding(positions, want_jac=True)
            jac = jac / 4.0  # chain through the normalization
        elif want_jac:
            # non-hash encodings: jacobian via jvp (their gathers are plain
            # jnp.take, which supports forward mode)
            feature = self.encoding(positions)
            cols = []
            for a in range(3):
                t = jnp.zeros_like(positions).at[..., a].set(0.25)
                _, ja = jax.jvp(self.encoding, (positions,), (t,))
                cols.append(ja)
            jac = jnp.stack(cols, axis=-1)
        else:
            feature = self.encoding(positions)
            jac = None
        if hash_mask is not None:
            feature = feature * hash_mask
            if jac is not None:
                jac = jac * hash_mask[..., None]
        return feature, jac

    def geonetwork(
        self, x: jnp.ndarray, hash_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """SDF + geometric feature (reference forward_geonetwork,
        sdf_field.py:380-410). ``x`` are (possibly contracted) world
        positions in [-2, 2]; returns [..., 1 + geo_feat_dim]."""
        checks.check_positions(x, "SDFField.geonetwork positions")
        feature, _ = self._grid_feature(x, hash_mask, want_jac=False)
        return self._geo_mlp(x, feature)

    def geonetwork_with_gradient(
        self,
        x: jnp.ndarray,
        hash_mask: Optional[jnp.ndarray] = None,
        mode: str = "vjp",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(geonetwork output, d sdf / dx) from ONE table gather.

        The encode jacobian is analytic; only the (cheap, MXU-friendly)
        MLP is differentiated. Two modes:

        - ``"vjp"`` (default): ONE reverse pass through the MLP with the
          sdf-row cotangent, chained onto the analytic encode jacobian
          (d sdf/dx = d sdf/dx_direct + enc_jacᵀ · d sdf/d feature). The
          sdf output is scalar per point, so reverse mode needs a single
          cotangent sweep where forward mode needs 3 tangent sweeps — the
          step's HLO showed the 3-tangent path quadrupling per-layer
          activation traffic ([N,hidden,3] tangent convolution fusions).
        - ``"jvp"``: the 3-tangent `jax.linearize` path (kept for A/B and
          as fallback if the reverse-over-reverse eikonal compile ever
          regresses on a new toolchain).

        Both replace naive autodiff through the table gather, whose
        training backward compiled to four independent scatter-add
        instances (docs/tpu-design.md)."""
        feature, fjac = self._grid_feature(x, hash_mask, want_jac=True)
        # named so the train step's remat policy can save them: recomputing
        # the encode in the backward pass would redo the 12.6M-row gather
        from jax.ad_checkpoint import checkpoint_name

        feature = checkpoint_name(feature, "hash_feature")
        fjac = checkpoint_name(fjac, "hash_jac")
        if mode == "vjp":
            h, vjp_fn = jax.vjp(self._geo_mlp, x, feature)
            ct = jnp.zeros_like(h).at[..., 0].set(1.0)
            dx, dfeat = vjp_fn(ct)
            grad = dx.astype(x.dtype) + jnp.einsum(
                "...f,...fa->...a", dfeat.astype(fjac.dtype), fjac
            )
            return h, grad
        h, lin = jax.linearize(self._geo_mlp, x, feature)
        grads = []
        for a in range(3):
            tx = jnp.zeros_like(x).at[..., a].set(1.0)
            grads.append(lin(tx, fjac[..., a])[..., 0])
        return h, jnp.stack(grads, axis=-1)

    def get_sdf_feat(
        self, x: jnp.ndarray, hash_mask: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = self.geonetwork(x, hash_mask)
        return h[..., :1], h[..., 1:]

    def get_inv_s(self) -> jnp.ndarray:
        return density_ops.variance_inv_s(self.deviation)

    def get_beta(self) -> jnp.ndarray:
        return density_ops.effective_beta(self.laplace_beta)

    def laplace_density(self, sdf: jnp.ndarray, beta: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if beta is None:
            beta = self.get_beta()
        return density_ops.laplace_density(sdf, beta)

    def colors(
        self,
        points: jnp.ndarray,  # [N, 3]
        directions: jnp.ndarray,  # [N, 3]
        gradients: jnp.ndarray,  # [N, 3]
        geo_features: jnp.ndarray,  # [N, geo_feat]
        camera_indices: jnp.ndarray,  # [N] int32
        train: bool = True,
        use_average_appearance: bool = False,
    ) -> jnp.ndarray:
        """View-dependent color (reference get_colors, sdf_field.py:532-612)."""
        cfg = self.config
        normals = safe_normalize(gradients)

        if cfg.use_reflections:
            refdirs = (
                2.0 * jnp.sum(normals * -directions, axis=-1, keepdims=True) * normals
                + directions
            )
            d = self.direction_encoding(refdirs)
        else:
            d = self.direction_encoding(directions)

        if train:
            emb = self.embedding_appearance(camera_indices)
            if not cfg.use_appearance_embedding:
                emb = jnp.zeros_like(emb)
        else:
            if use_average_appearance:
                emb = jnp.broadcast_to(
                    jnp.mean(self.embedding_appearance.embedding, axis=0),
                    (*directions.shape[:-1], cfg.appearance_embedding_dim),
                )
            else:
                emb = jnp.zeros(
                    (*directions.shape[:-1], cfg.appearance_embedding_dim),
                    dtype=directions.dtype,
                )

        if cfg.use_diffuse_color:
            h = [d, geo_features, emb]
        else:
            h = [points, d, gradients, geo_features, emb]
        if cfg.use_n_dot_v:
            h.append(jnp.sum(normals * directions, axis=-1, keepdims=True))
        h = jnp.concatenate(h, axis=-1)

        n = len(self.clayers)
        from sdfstudio_tpu.ops.mlp import use_fused_mlp_default

        if use_fused_mlp_default():
            # one Pallas fully-fused kernel over the whole color chain (the
            # color net sits under the outer loss grad only — reverse mode —
            # so the fused custom_vjp is safe here, unlike the geonetwork
            # which needs forward-mode JVP for eikonal gradients)
            from sdfstudio_tpu.ops.pallas_mlp import fused_mlp

            # each layer's params are created/fetched with its OWN input
            # width (self.cdims[l]); the dummy is only read for its shape
            kbs = [
                self.clayers[l](
                    jnp.zeros((1, self.cdims[l]), h.dtype), return_effective=True
                )
                for l in range(n)
            ]
            h = fused_mlp(
                h, [k for k, _ in kbs], [b for _, b in kbs], activation="relu"
            )
        else:
            for l in range(n):
                h = self.clayers[l](h)
                if l < n - 1:
                    h = jax.nn.relu(h)
        rgb = jax.nn.sigmoid(h)

        if cfg.use_diffuse_color:
            raw_rgb_diffuse = self.diffuse_color_pred(geo_features)
            diffuse_linear = jax.nn.sigmoid(raw_rgb_diffuse - np.log(3.0))
            if cfg.use_specular_tint:
                tint = jax.nn.sigmoid(self.specular_tint_pred(geo_features))
                specular_linear = tint * rgb
            else:
                specular_linear = 0.5 * rgb
            rgb = jnp.clip(specular_linear + diffuse_linear, 0.0, 1.0)

        # padding maps color to [-pad, 1+pad] (sdf_field.py:610)
        return rgb * (1 + 2 * cfg.rgb_padding) - cfg.rgb_padding

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Init entry point: touch every submodule once."""
        h = self.geonetwork(x)
        sdf, feat = h[..., :1], h[..., 1:]
        dirs = safe_normalize(x)
        cam = jnp.zeros(x.shape[:-1], dtype=jnp.int32)
        rgb = self.colors(x, dirs, jnp.ones_like(x), feat, cam, train=True)
        return jnp.concatenate([sdf, rgb], axis=-1) + 0.0 * self.get_inv_s() + 0.0 * self.get_beta()


# ---------------------------------------------------------------------------
# Functional layer: gradients + full field outputs. These close over
# (module, params) and are differentiable end-to-end.
# ---------------------------------------------------------------------------


def _core_remat_policy():
    """Remat policy for the field core (gradients identical either way;
    only the memory/recompute tradeoff changes):

    * ``save-hash`` (default): save the named encode outputs — recomputing
      them in the backward would redo the dominant multi-M-row gather;
    * ``nothing``: rematerialize everything (minimum residency — the lever
      for large-batch runs where even the saved encode outputs overflow
      HBM, e.g. the 8192-ray probe);
    * ``dots``: save matmul outputs (XLA's classic policy) — trades more
      memory for fewer MLP recomputes.

    Env-gated (``SST_REMAT_POLICY``) rather than config so perf probes can
    sweep it without touching the config tree.
    """
    import os

    mode = os.environ.get("SST_REMAT_POLICY", "save-hash")
    if mode == "nothing":
        return jax.checkpoint_policies.nothing_saveable
    if mode == "dots":
        return jax.checkpoint_policies.dots_saveable
    return jax.checkpoint_policies.save_only_these_names(
        "hash_feature", "hash_jac", "hash_corner_feats"
    )


@dataclasses.dataclass
class SDFField:
    """Host-side field wrapper bundling the module def with pure methods.

    Replaces the stateful torch SDFField (sdf_field.py:188): schedule-driven
    state (cos-anneal ratio, hash mask, numerical-grad delta) is passed in
    per call instead of mutated."""

    config: SDFFieldConfig
    num_images: int = 1
    spatial_distortion: Optional[str] = None  # None | "inf" | "l2"
    use_average_appearance_embedding: bool = False

    def __post_init__(self):
        self.module = SDFFieldNet(config=self.config, num_images=self.num_images)

    def init(self, rng: jax.Array) -> FrozenDict:
        x = jnp.zeros((8, 3))
        return self.module.init(rng, x)["params"]

    # -- closures ------------------------------------------------------
    def geonetwork_fn(
        self, params: FieldParams, hash_mask: Optional[jnp.ndarray] = None
    ) -> Callable[[jnp.ndarray], jnp.ndarray]:
        def fn(x):
            return self.module.apply(
                {"params": params}, x, hash_mask, method=SDFFieldNet.geonetwork
            )

        return fn

    def sdf_fn(
        self, params: FieldParams, hash_mask: Optional[jnp.ndarray] = None
    ) -> Callable[[jnp.ndarray], jnp.ndarray]:
        geonet = self.geonetwork_fn(params, hash_mask)

        def fn(x):
            return geonet(x)[..., 0]

        return fn

    def contract_positions(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.spatial_distortion == "inf":
            return contract(x, order=jnp.inf)
        if self.spatial_distortion == "l2":
            return contract(x, order=None)
        return x

    def get_inv_s(self, params: FieldParams) -> jnp.ndarray:
        return density_ops.variance_inv_s(params["deviation"])

    def get_beta(self, params: FieldParams) -> jnp.ndarray:
        return density_ops.effective_beta(params["laplace_beta"])

    def density_fn(self, params: FieldParams, sdf: jnp.ndarray, beta=None) -> jnp.ndarray:
        if beta is None:
            beta = self.get_beta(params)
        return density_ops.laplace_density(sdf, beta)

    # -- gradients -----------------------------------------------------
    def gradient(
        self,
        params: FieldParams,
        x: jnp.ndarray,
        hash_mask: Optional[jnp.ndarray] = None,
        numerical_delta: Optional[jnp.ndarray] = None,
        skip_spatial_distortion: bool = False,
        return_sampled_sdf: bool = False,
    ):
        """SDF spatial gradient (reference sdf_field.py:424-465).

        Analytic mode: one extra backward pass via jax.grad of the summed
        sdf (outputs are per-point independent, so d(sum)/dx_i is the
        per-point gradient). Numerical mode: 6-tap central differences
        (Neuralangelo), returning the 6 tap sdf values for curvature loss.
        """
        if not skip_spatial_distortion:
            x = self.contract_positions(x)
        geonet = self.geonetwork_fn(params, hash_mask)

        if self.config.use_numerical_gradients:
            delta = numerical_delta if numerical_delta is not None else 1e-4
            offsets = jnp.asarray(
                [
                    [1, 0, 0],
                    [-1, 0, 0],
                    [0, 1, 0],
                    [0, -1, 0],
                    [0, 0, 1],
                    [0, 0, -1],
                ],
                dtype=x.dtype,
            )  # [6, 3]
            pts = x[None, ...] + delta * offsets[:, None, :]  # [6, N, 3]
            sdf6 = geonet(pts.reshape(-1, 3))[..., 0].reshape(6, *x.shape[:-1])
            grads = jnp.stack(
                [
                    0.5 * (sdf6[0] - sdf6[1]) / delta,
                    0.5 * (sdf6[2] - sdf6[3]) / delta,
                    0.5 * (sdf6[4] - sdf6[5]) / delta,
                ],
                axis=-1,
            )
            if return_sampled_sdf:
                return grads, jnp.moveaxis(sdf6, 0, -1)  # [N, 6]
            return grads

        if self.config.analytic_gradient_mode in ("jvp", "vjp"):
            _, grads = self.module.apply(
                {"params": params},
                x,
                hash_mask,
                self.config.analytic_gradient_mode,
                method=SDFFieldNet.geonetwork_with_gradient,
            )
        else:
            grads = analytic_sdf_gradient(
                lambda p: geonet(p)[..., 0], x, mode=self.config.analytic_gradient_mode
            )
        if return_sampled_sdf:
            return grads, None
        return grads

    # -- full outputs --------------------------------------------------
    def get_outputs(
        self,
        params: FieldParams,
        ray_samples: RaySamples,
        hash_mask: Optional[jnp.ndarray] = None,
        cos_anneal_ratio: jnp.ndarray | float = 1.0,
        numerical_delta: Optional[jnp.ndarray] = None,
        inv_s_override: Optional[jnp.ndarray] = None,
        beta_override: Optional[jnp.ndarray] = None,
        return_alphas: bool = False,
        return_occupancy: bool = False,
        train: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Field forward over ray samples (reference sdf_field.py:614-689).

        Returns dict with rgb/density/sdf/normal/gradient/points_norm
        (+alpha/+occupancy), each shaped [R, S, ...].
        """
        R, S = ray_samples.num_rays, ray_samples.num_samples
        inputs = ray_samples.get_start_positions().reshape(-1, 3)
        directions = jnp.broadcast_to(
            ray_samples.directions[..., None, :], (R, S, 3)
        ).reshape(-1, 3)
        if ray_samples.camera_indices is not None:
            camera_indices = jnp.broadcast_to(
                ray_samples.camera_indices[..., None], (R, S)
            ).reshape(-1)
        else:
            camera_indices = jnp.zeros((R * S,), dtype=jnp.int32)

        inputs = self.contract_positions(inputs)
        points_norm = jnp.linalg.norm(inputs, axis=-1)

        delta_arg = (
            jnp.asarray(numerical_delta) if numerical_delta is not None else jnp.asarray(1e-4)
        )

        def core(params, inputs, directions, camera_indices, delta):
            """Per-point field core: geonetwork + input-gradients + colors.

            Rematerialized (jax.checkpoint): the eikonal double backprop
            otherwise keeps every encoding/MLP intermediate alive into the
            outer backward pass — at DTU scale that overflows HBM (observed
            18GB vs 15.75GB on v5e)."""
            sampled_sdf = None
            if self.config.use_numerical_gradients:
                h = self.geonetwork_fn(params, hash_mask)(inputs)
                gradients, sampled_sdf = self.gradient(
                    params,
                    inputs,
                    hash_mask=hash_mask,
                    numerical_delta=delta,
                    skip_spatial_distortion=True,
                    return_sampled_sdf=True,
                )
            elif self.config.analytic_gradient_mode in ("jvp", "vjp"):
                # one gather: primal + analytic-jacobian gradient together
                h, gradients = self.module.apply(
                    {"params": params},
                    inputs,
                    hash_mask,
                    self.config.analytic_gradient_mode,
                    method=SDFFieldNet.geonetwork_with_gradient,
                )
            else:
                geonet = self.geonetwork_fn(params, hash_mask)
                h = geonet(inputs)
                gradients = analytic_sdf_gradient(
                    lambda p: geonet(p)[..., 0],
                    inputs,
                    mode=self.config.analytic_gradient_mode,
                )
            sdf, geo_feat = h[..., :1], h[..., 1:]

            rgb = self.module.apply(
                {"params": params},
                inputs,
                directions,
                gradients,
                geo_feat,
                camera_indices,
                train,
                self.use_average_appearance_embedding,
                method=SDFFieldNet.colors,
            )
            return rgb, sdf, gradients, sampled_sdf

        rgb, sdf, gradients, sampled_sdf = jax.checkpoint(
            core, policy=_core_remat_policy()
        )(
            params, inputs, directions, camera_indices, delta_arg
        )

        # scheduled beta-anneal overrides the learned laplace beta (the
        # reference writes the parameter in-place, bakedsdf.py:197-204)
        beta = beta_override if beta_override is not None else self.get_beta(params)
        density = density_ops.laplace_density(sdf[..., 0], beta)

        outputs = {
            "rgb": rgb.reshape(R, S, 3),
            "density": density.reshape(R, S),
            "sdf": sdf.reshape(R, S),
            "gradient": gradients.reshape(R, S, 3),
            "normal": safe_normalize(gradients).reshape(R, S, 3),
            "points_norm": points_norm.reshape(R, S),
        }
        if sampled_sdf is not None:
            outputs["sampled_sdf"] = sampled_sdf.reshape(R, S, 6)

        if return_alphas:
            # scheduled beta-anneal overrides the learned deviation (the
            # reference writes the parameter in-place, neus_facto.py:191-196)
            inv_s = inv_s_override if inv_s_override is not None else self.get_inv_s(params)
            outputs["alpha"] = density_ops.neus_alpha(
                outputs["sdf"],
                outputs["gradient"],
                ray_samples.directions,
                ray_samples.deltas,
                inv_s,
                jnp.asarray(cos_anneal_ratio),
            )
        if return_occupancy:
            outputs["occupancy"] = density_ops.unisurf_occupancy(outputs["sdf"])
        return outputs
