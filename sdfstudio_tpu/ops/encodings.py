"""Input encodings.

Functional spec: reference nerfstudio/field_components/encodings.py:41-756
(NeRFEncoding incl. IPE + off-axis, RFF, HashEncoding, TensorCP/VM,
SHEncoding, PeriodicVolumeEncoding). TPU-native design notes:

* The multi-res hash grid is evaluated as ONE batched gather over a
  ``[num_levels * table_size, F]`` table — all levels and all 8 corners in a
  single ``take`` so XLA emits one fused gather; the backward pass is a
  single scatter-add. Coarse levels whose dense grid fits in the table are
  indexed densely (collision-free), matching tcnn's HashGrid behavior that
  the reference actually runs (sdf_field.py:230-241).
* Hashing uses uint32 wrap-around arithmetic (the instant-ngp spec, primes
  1 / 2654435761 / 805459861 — encodings.py:350).
* Everything is float32 in/out; tables can be bf16 later without touching
  callers.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sdfstudio_tpu.core.math import components_from_spherical_harmonics, expected_sin
from sdfstudio_tpu.utils import checks

# Icosahedron projection matrix for mip-360 off-axis encoding
# (reference encodings.py:129-153); stored transposed [3, 21].
OFF_AXIS_P = np.array(
    [
        [0.8506508, 0, 0.5257311],
        [0.809017, 0.5, 0.309017],
        [0.5257311, 0.8506508, 0],
        [1, 0, 0],
        [0.809017, 0.5, -0.309017],
        [0.8506508, 0, -0.5257311],
        [0.309017, 0.809017, -0.5],
        [0, 0.5257311, -0.8506508],
        [0.5, 0.309017, -0.809017],
        [0, 1, 0],
        [-0.5257311, 0.8506508, 0],
        [-0.309017, 0.809017, -0.5],
        [0, 0.5257311, 0.8506508],
        [-0.309017, 0.809017, 0.5],
        [0.309017, 0.809017, 0.5],
        [0.5, 0.309017, 0.809017],
        [0.5, -0.309017, 0.809017],
        [0, 0, 1],
        [-0.5, 0.309017, 0.809017],
        [-0.809017, 0.5, 0.309017],
        [-0.809017, 0.5, -0.309017],
    ],
    dtype=np.float32,
).T  # [3, 21]


def nerf_encoding(
    x: jnp.ndarray,
    num_frequencies: int,
    min_freq_exp: float,
    max_freq_exp: float,
    include_input: bool = False,
    off_axis: bool = False,
    covs: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sinusoidal positional encoding, with optional mip-NeRF IPE
    (reference encodings.py:99-208)."""
    freqs = 2.0 ** jnp.linspace(min_freq_exp, max_freq_exp, num_frequencies)
    if off_axis:
        proj = x @ jnp.asarray(OFF_AXIS_P)  # [..., 21]
        scaled = proj[..., None] * freqs  # [..., 21, F]
    else:
        scaled = x[..., None] * freqs  # [..., D, F]
    scaled = scaled.reshape(*scaled.shape[:-2], -1)

    if covs is None:
        encoded = jnp.sin(jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1))
    else:
        input_var = (
            jnp.diagonal(covs, axis1=-2, axis2=-1)[..., :, None] * freqs[None, :] ** 2
        )
        input_var = input_var.reshape(*input_var.shape[:-2], -1)
        encoded = expected_sin(
            jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1),
            jnp.concatenate([input_var, input_var], axis=-1),
        )

    if include_input:
        encoded = jnp.concatenate([encoded, x], axis=-1)
    return encoded


def nerf_encoding_dim(
    in_dim: int, num_frequencies: int, include_input: bool = False, off_axis: bool = False
) -> int:
    out = (OFF_AXIS_P.shape[1] if off_axis else in_dim) * num_frequencies * 2
    if include_input:
        out += in_dim
    return out


class NeRFEncoding(nn.Module):
    """Module wrapper for :func:`nerf_encoding`."""

    in_dim: int = 3
    num_frequencies: int = 6
    min_freq_exp: float = 0.0
    max_freq_exp: float = 5.0
    include_input: bool = False
    off_axis: bool = False

    @property
    def out_dim(self) -> int:
        return nerf_encoding_dim(
            self.in_dim, self.num_frequencies, self.include_input, self.off_axis
        )

    def __call__(self, x: jnp.ndarray, covs: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return nerf_encoding(
            x,
            self.num_frequencies,
            self.min_freq_exp,
            self.max_freq_exp,
            self.include_input,
            self.off_axis,
            covs=covs,
        )


class RFFEncoding(nn.Module):
    """Random Fourier Features (reference encodings.py:211-266). The random
    projection matrix is a fixed (non-trainable) variable."""

    in_dim: int = 3
    num_frequencies: int = 64
    scale: float = 10.0
    include_input: bool = False

    @property
    def out_dim(self) -> int:
        return self.num_frequencies * 2 + (self.in_dim if self.include_input else 0)

    @nn.compact
    def __call__(self, x: jnp.ndarray, covs: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b_matrix = self.variable(
            "constants",
            "b_matrix",
            lambda: self.scale
            * jax.random.normal(
                jax.random.PRNGKey(0), (self.in_dim, self.num_frequencies)
            ),
        ).value
        x2pi = 2 * jnp.pi * x
        scaled = x2pi @ b_matrix
        if covs is None:
            encoded = jnp.sin(jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1))
        else:
            input_var = jnp.sum((covs @ b_matrix) * b_matrix, axis=-2)
            encoded = expected_sin(
                jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1),
                jnp.concatenate([input_var, input_var], axis=-1),
            )
        if self.include_input:
            encoded = jnp.concatenate([encoded, x2pi], axis=-1)
        return encoded


class SHEncoding(nn.Module):
    """Spherical harmonics of the direction (reference encodings.py:594-614)."""

    levels: int = 4

    @property
    def out_dim(self) -> int:
        return self.levels**2

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jax.lax.stop_gradient(
            components_from_spherical_harmonics(self.levels, x)
        )


# ---------------------------------------------------------------------------
# Multi-resolution hash grid
# ---------------------------------------------------------------------------

HASH_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


def _level_resolutions(num_levels: int, min_res: int, max_res: int) -> np.ndarray:
    """Per-level grid scalings: floor(min_res * growth**level)
    (reference encodings.py:301-303)."""
    if num_levels > 1:
        growth = math.exp((math.log(max_res) - math.log(min_res)) / (num_levels - 1))
    else:
        growth = 1.0
    levels = np.arange(num_levels)
    return np.floor(min_res * growth**levels).astype(np.int32)


@jax.custom_vjp
def table_gather(table_t: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather columns of an SOA feature table: [F, R], [..., K] -> [F, ..., K].

    The forward is a plain XLA gather (~160M rows/s measured on v5e). The
    custom VJP replaces XLA's scatter-add transpose — which executes at
    ~15M updates/s on TPU regardless of sortedness hints — with the
    sort+cumsum construction in ops/scatter.py (~10x faster at hash-grid
    sizes). NOTE: custom_vjp forbids forward-mode; callers that need input
    jacobians use HashEncoding's analytic ``want_jac`` path instead of
    jax.jvp through the encode.
    """
    return jnp.take(table_t, idx, axis=1)


def _table_gather_fwd(table_t, idx):
    return table_gather(table_t, idx), (idx, table_t.shape)


def _table_gather_bwd(res, g):
    from sdfstudio_tpu.ops.scatter import sorted_segment_add

    idx, (F, R) = res
    table_dtype = g.dtype  # cotangent dtype == output dtype == table dtype
    flat_i = idx.reshape(-1)
    # Accumulate in f32 even for bf16 tables: millions of tiny updates per
    # row would swamp bf16's 8-bit mantissa. The result is cast back to the
    # table dtype; the f32->bf16 cast upstream (see HashEncoding) then
    # forwards it to the f32 master param.
    flat_g = jnp.moveaxis(g, 0, -1).reshape(-1, F).astype(jnp.float32)  # [M, F]
    if jax.default_backend() == "cpu":
        # CPU scatter-add is fast; the sort construction's R-query argsorts
        # are not. Strategy picked at trace time per backend.
        dtable = jnp.zeros((R, F), flat_g.dtype).at[flat_i].add(flat_g)
    else:
        dtable = sorted_segment_add(flat_i, flat_g, R)  # [R, F]
    return dtable.T.astype(table_dtype), None


table_gather.defvjp(_table_gather_fwd, _table_gather_bwd)


class HashEncoding(nn.Module):
    """Instant-NGP multi-resolution hash grid (functional spec:
    reference encodings.py:269-403; actually executed as tcnn HashGrid from
    sdf_field.py:230-241).

    Inputs are expected in ``[0, 1]^3``; out-of-range inputs are hashed
    periodically (no clamping), matching tcnn.

    A level whose dense grid ``(res+1)^3`` fits within ``2**log2_hashmap_size``
    entries is indexed densely (no collisions), like tcnn.

    ``__call__(x, want_jac=True)`` additionally returns the analytic
    jacobian d(out)/dx — computed from the SAME single gather — so SDF
    input-gradients never need jax.jvp through the table gather (which
    both forbids the custom VJP above and, when traced 3x for basis
    tangents, compiled to FOUR independent 12.6M-row scatter instances in
    the train step's backward — measured ~3.7s/step of the original
    5.8s/step on v5e).
    """

    num_levels: int = 16
    min_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    hash_init_scale: float = 1e-4
    smoothstep: bool = False
    # Gather-compute dtype for the table ("float32" | "bfloat16"). The
    # master param stays f32 (Adam precision); "bfloat16" casts the SOA
    # table once per step before the gather — halving the bytes the
    # dominant multi-M-row random gather moves — exactly tcnn's fp16
    # HashGrid training mode that the reference runs (sdf_field.py:230).
    # Trilinear blend + jacobian still run in f32.
    table_dtype: str = "float32"

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def table_size(self) -> int:
        return 2**self.log2_hashmap_size

    @property
    def level_sizes(self) -> np.ndarray:
        """Per-level row counts: dense levels store exactly (res+1)^3 rows,
        hashed levels the full table. Compact sizing matters on TPU: the
        gradient segment-add's merged sort carries one query key per table
        row (ops/scatter.py), so empty dense-level padding rows would cost
        real sort time every backward pass (measured: the R-term dominates
        at L*2^19 stacked size — 29M upd/s vs 125M upd/s compact)."""
        res = _level_resolutions(self.num_levels, self.min_res, self.max_res)
        dense = (res.astype(np.int64) + 1) ** 3
        return np.minimum(dense, self.table_size).astype(np.int64)

    @property
    def level_offsets(self) -> np.ndarray:
        """Exclusive prefix of level_sizes ([L+1]; last entry = total rows)."""
        return np.concatenate([[0], np.cumsum(self.level_sizes)])

    @property
    def total_rows(self) -> int:
        return int(self.level_offsets[-1])

    def corner_indices(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Compute the flat table indices for the 8 trilinear corners.

        Args:
            x: [..., 3] positions in [0, 1].
        Returns:
            (indices [..., L, 8] int32 into the stacked table, lerp weights
            offset [..., L, 3]).
        """
        resolutions = jnp.asarray(_level_resolutions(self.num_levels, self.min_res, self.max_res))
        scaled = x[..., None, :] * resolutions[:, None].astype(x.dtype)  # [..., L, 3]
        floor = jnp.floor(scaled)
        offset = scaled - floor
        floor_i = floor.astype(jnp.int32)

        # 8 corners: bit b of corner c selects ceil (floor+1) on axis b.
        corners = jnp.asarray(
            [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)],
            dtype=jnp.int32,
        )  # [8, 3]
        coords = floor_i[..., None, :] + corners  # [..., L, 8, 3]

        ucoords = coords.astype(jnp.uint32)
        # Hashed index (uint32 wrap-around xor-mult hash).
        primes = jnp.asarray(HASH_PRIMES)
        hashed = (ucoords[..., 0] * primes[0]) ^ (ucoords[..., 1] * primes[1]) ^ (
            ucoords[..., 2] * primes[2]
        )
        hashed = (hashed % jnp.uint32(self.table_size)).astype(jnp.int32)

        # Dense index for collision-free coarse levels (fits computed on host).
        res_p1 = (resolutions + 1).astype(jnp.uint32)  # [L]
        res_np = _level_resolutions(self.num_levels, self.min_res, self.max_res)
        fits = jnp.asarray(((res_np.astype(np.int64) + 1) ** 3) <= self.table_size)
        stride = res_p1[:, None]  # [L, 1]
        dense = (
            ucoords[..., 0]
            + ucoords[..., 1] * stride
            + ucoords[..., 2] * stride * stride
        ).astype(jnp.int32)

        idx = jnp.where(fits[:, None], dense, hashed)  # [..., L, 8]
        # compact per-level offsets (see level_sizes)
        level_offset = jnp.asarray(self.level_offsets[:-1].astype(np.int32))[:, None]
        return idx + level_offset, offset

    @nn.compact
    def __call__(self, x: jnp.ndarray, want_jac: bool = False):
        """Encode ``x`` in [0,1]^3 -> [..., L*F]; with ``want_jac`` also
        return d(out)/dx [..., L*F, 3] from the same single gather."""
        checks.check_positions(x, "HashEncoding positions")
        table = self.param(
            "hash_table",
            lambda key, shape: (jax.random.uniform(key, shape) * 2.0 - 1.0)
            * self.hash_init_scale,
            (self.total_rows, self.features_per_level),
        )
        idx, offset = self.corner_indices(x)  # [..., L, 8], [..., L, 3]

        o = offset
        if self.smoothstep:
            w = o * o * (3.0 - 2.0 * o)
            dw = 6.0 * o * (1.0 - o)  # d smoothstep / d offset
        else:
            w = o
            dw = jnp.ones_like(o)
        # Trilinear blend: corner c has weight prod_b (w_b if bit set else 1-w_b).
        corners = jnp.asarray(
            [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)],
            dtype=x.dtype,
        )  # [8, 3]
        cw = corners[None, :, :] * w[..., None, :] + (1.0 - corners[None, :, :]) * (
            1.0 - w[..., None, :]
        )  # [..., L, 8, 3]
        weights = jnp.prod(cw, axis=-1)  # [..., L, 8]

        # TPU layout note: gather results and weights are flattened so the
        # minor-most dimension is L*8 (=128 at default settings) — a
        # [..., L, 8, F] gather output would be tile-padded 16-64x in HBM
        # (observed 18GB/15.75GB OOM at DTU scale). Features are gathered
        # SOA ([F, ..., L*8]) and contracted per feature.
        batch = x.shape[:-1]
        L, FPL = self.num_levels, self.features_per_level
        K = L * 8
        idx_flat = idx.reshape(*batch, K)
        table_t = table.T  # [F, total_rows]
        if self.table_dtype != "float32":
            table_t = table_t.astype(self.table_dtype)
        feats = table_gather(table_t, idx_flat).astype(x.dtype)  # [F, ..., K]
        # named so remat policies can SAVE the gathered corner rows: the
        # backward pass needs them (d weights/dx chains through the corner
        # features), and recomputing the forward under jax.checkpoint would
        # redo the dominant multi-M-row gather (~193M rows/s measured)
        from jax.ad_checkpoint import checkpoint_name

        feats = checkpoint_name(feats, "hash_corner_feats")

        def blend(wts):
            weighted = feats * wts.reshape(*batch, K)[None]
            per_level = jnp.sum(weighted.reshape(FPL, *batch, L, 8), axis=-1)
            return jnp.moveaxis(per_level, 0, -1).reshape(*batch, L * FPL)

        out = blend(weights)
        if not want_jac:
            return out

        # d weight_c / d x_a = res_l * dsmooth_a * sign_a(c) * prod_{b!=a} cw_b
        res = jnp.asarray(
            _level_resolutions(L, self.min_res, self.max_res)
        ).astype(x.dtype)  # [L]
        sign = 2.0 * corners - 1.0  # [8, 3]
        # exclusive products over the 3 axes (avoid division: cw can be 0)
        p0 = cw[..., 1] * cw[..., 2]
        p1 = cw[..., 0] * cw[..., 2]
        p2 = cw[..., 0] * cw[..., 1]
        pexcl = jnp.stack([p0, p1, p2], axis=-1)  # [..., L, 8, 3]
        dweights = (
            sign[None, :, :]
            * dw[..., None, :]
            * pexcl
            * res[:, None, None]
        )  # [..., L, 8, 3]
        jac = jnp.stack([blend(dweights[..., a]) for a in range(3)], axis=-1)
        return out, jac  # [..., L*F], [..., L*F, 3]


class PeriodicVolumeEncoding(nn.Module):
    """Dense periodic volume encoding with TV loss
    (reference encodings.py:617-756). Coordinates index a dense
    ``res^3`` volume modulo its resolution; levels share one table tensor."""

    num_levels: int = 4
    min_res: int = 16
    max_res: int = 512
    log2_hashmap_size: int = 18  # must be divisible by 3
    features_per_level: int = 2
    hash_init_scale: float = 1e-3
    smoothstep: bool = False

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def table_size(self) -> int:
        return 2**self.log2_hashmap_size

    @property
    def volume_resolution(self) -> int:
        assert self.log2_hashmap_size % 3 == 0
        return 2 ** (self.log2_hashmap_size // 3)

    def _table_init(self, key, shape):
        return (jax.random.uniform(key, shape) * 2.0 - 1.0) * self.hash_init_scale

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "hash_table",
            self._table_init,
            (self.table_size * self.num_levels, self.features_per_level),
        )
        res = self.volume_resolution
        resolutions = jnp.asarray(_level_resolutions(self.num_levels, self.min_res, self.max_res))
        scaled = x[..., None, :] * resolutions[:, None].astype(x.dtype)
        floor = jnp.floor(scaled)
        offset = scaled - floor
        if self.smoothstep:
            offset = offset * offset * (3.0 - 2.0 * offset)
        floor_i = floor.astype(jnp.int32)

        corners = jnp.asarray(
            [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)],
            dtype=jnp.int32,
        )
        coords = jnp.mod(floor_i[..., None, :] + corners, res)  # periodic
        idx = (
            coords[..., 0] * (res * res) + coords[..., 1] * res + coords[..., 2]
        )  # [..., L, 8]
        level_offset = (jnp.arange(self.num_levels, dtype=jnp.int32) * self.table_size)[:, None]
        feats = jnp.take(table, idx + level_offset, axis=0)  # [..., L, 8, F]

        cornersf = corners.astype(x.dtype)
        cw = cornersf[None] * offset[..., None, :] + (1.0 - cornersf[None]) * (
            1.0 - offset[..., None, :]
        )
        weights = jnp.prod(cw, axis=-1)
        out = jnp.sum(feats * weights[..., None], axis=-2)
        return out.reshape(*x.shape[:-1], self.out_dim)

    def total_variation_loss(self, table: jnp.ndarray) -> jnp.ndarray:
        """Mean |Δ| over the three volume axes (reference encodings.py:738-756)."""
        res = self.volume_resolution
        vol = table.reshape(self.num_levels, res, res, res, self.features_per_level)
        tv = 0.0
        for axis in (1, 2, 3):
            d = jnp.diff(vol, axis=axis)
            tv = tv + jnp.mean(jnp.abs(d), axis=(1, 2, 3, 4))
        return jnp.sum(tv)


class TensorVMEncoding(nn.Module):
    """Tri-plane (TensoRF vector-matrix, planes only — the reference disables
    the line factors, encodings.py:567-570) with differentiable bilinear
    sampling + optional smoothstep (reference encodings.py:456-591).

    Inputs in [0, 1]^3 (callers pass (x+2)/4, sdf_field.py:384)."""

    resolution: int = 128
    num_components: int = 24
    init_scale: float = 0.1
    smoothstep: bool = False

    @property
    def out_dim(self) -> int:
        return self.num_components * 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        planes = self.param(
            "plane_coef",
            lambda key, shape: self.init_scale * jax.random.normal(key, shape),
            (3, self.resolution, self.resolution, self.num_components),
        )
        res = self.resolution
        # (x,y), (x,z), (y,z) planes (reference encodings.py:553).
        coords2d = jnp.stack(
            [x[..., jnp.array([0, 1])], x[..., jnp.array([0, 2])], x[..., jnp.array([1, 2])]],
            axis=0,
        )  # [3, ..., 2]
        scaled = coords2d * res
        floor = jnp.floor(scaled)
        offset = scaled - floor
        if self.smoothstep:
            offset = offset * offset * (3.0 - 2.0 * offset)
        f = jnp.clip(floor.astype(jnp.int32), 0, res - 1)
        c = jnp.clip(f + 1, 0, res - 1)

        # corner indices [3, ...]: flat = y * res + x (reference index_fn
        # encodings.py:489-500 uses y*width+x with x = coord axis 0)
        i00 = f[..., 1] * res + f[..., 0]
        i01 = f[..., 1] * res + c[..., 0]
        i10 = c[..., 1] * res + f[..., 0]
        i11 = c[..., 1] * res + c[..., 0]

        planes_flat = planes.reshape(3, res * res, self.num_components)

        def take_per_plane(pf, idx):
            return jnp.take(pf, idx, axis=0)

        f00 = jax.vmap(take_per_plane)(planes_flat, i00)
        f01 = jax.vmap(take_per_plane)(planes_flat, i01)
        f10 = jax.vmap(take_per_plane)(planes_flat, i10)
        f11 = jax.vmap(take_per_plane)(planes_flat, i11)

        wx = offset[..., 0:1]
        wy = offset[..., 1:2]
        fx0 = f00 * (1 - wx) + f01 * wx
        fx1 = f10 * (1 - wx) + f11 * wx
        feat = fx0 * (1 - wy) + fx1 * wy  # [3, ..., C]
        return jnp.moveaxis(feat, 0, -2).reshape(*x.shape[:-1], self.out_dim)


class TensorCPEncoding(nn.Module):
    """CP-decomposition line encoding (reference encodings.py:406-453)."""

    resolution: int = 256
    num_components: int = 24
    init_scale: float = 0.1

    @property
    def out_dim(self) -> int:
        return self.num_components

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        lines = self.param(
            "line_coef",
            lambda key, shape: self.init_scale * jax.random.normal(key, shape),
            (3, self.resolution, self.num_components),
        )
        res = self.resolution
        # order (z, y, x) per reference encodings.py:428
        coords = jnp.stack([x[..., 2], x[..., 1], x[..., 0]], axis=0)  # [3, ...]
        coords = jax.lax.stop_gradient(coords)
        scaled = jnp.clip(coords, 0.0, 1.0) * (res - 1)
        f = jnp.floor(scaled).astype(jnp.int32)
        c = jnp.clip(f + 1, 0, res - 1)
        w = (scaled - f)[..., None]

        def take_line(line, fi, ci):
            return jnp.take(line, fi, axis=0), jnp.take(line, ci, axis=0)

        lf, lc = jax.vmap(take_line)(lines, f, c)
        feats = lf * (1 - w) + lc * w  # [3, ..., C]
        return jnp.prod(feats, axis=0)
