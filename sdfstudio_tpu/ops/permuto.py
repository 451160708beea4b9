"""Permutohedral-lattice hash encoding (PermutoSDF, arXiv:2211.12562).

A TPU-native alternative to the cubic instant-ngp hash grid
(ops/encodings.py::HashEncoding): interpolation over the A*_3
permutohedral lattice needs only the d+1 = 4 simplex corners per lookup
instead of the 8 trilinear corners of a cube — HALVING the random
table-access count, which is the measured bottleneck of the train step on
TPU (XLA gather ~162M rows/s; the step is ~500x off its FLOP roofline, so
access count is everything; see docs/tpu-design.md).

Lattice math follows Adams et al., "Fast High-Dimensional Filtering Using
the Permutohedral Lattice" (2010): elevate the scaled position onto the
sum-zero hyperplane in R^4, round to the nearest remainder-0 lattice point,
rank the residuals to identify the enclosing simplex, and derive
barycentric weights from the sorted residuals. All steps are fixed-size
(4-wide) vector ops — no sorts, no data-dependent shapes — so the whole
encode is one fused XLA region plus a single batched gather.

The interface mirrors HashEncoding: ``__call__(x, want_jac=False)`` with
``want_jac`` returning the analytic d(out)/dx from the SAME single gather
(barycentric weights are piecewise-linear in x, so the jacobian is exact
within each simplex), and gathers run through ``table_gather`` (bf16-able
SOA layout + sort-based scatter VJP).

Used by SDFField via ``encoding_type="permuto"`` (sdf_field.py); the
reference has no equivalent — this is a deliberate performance redesign,
quality-tracked against the cubic hash on the DTU-like benchmark.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sdfstudio_tpu.ops.encodings import (
    HASH_PRIMES,
    _level_resolutions,
    table_gather,
)

D = 3  # input dimensionality (positions)

# Elevation matrix E [D+1, D]: elevated = p @ E.T lies on the sum-zero
# hyperplane of R^4. Columns follow Adams et al.'s recursive construction
# (cf_i appears +1x in rows < i and -i x in row i), scaled so unit input
# distance ~ unit lattice spacing: s_i = (D+1) * sqrt(2/3) / sqrt((i+1)(i+2)).
_S = [(D + 1) * math.sqrt(2.0 / 3.0) / math.sqrt((i + 1) * (i + 2)) for i in range(D)]
ELEVATE = np.array(
    [
        [_S[0], _S[1], _S[2]],
        [-_S[0], _S[1], _S[2]],
        [0.0, -2.0 * _S[1], _S[2]],
        [0.0, 0.0, -3.0 * _S[2]],
    ],
    dtype=np.float32,
)  # [4, 3]


def _simplex(elev: jnp.ndarray):
    """Enclosing-simplex data for elevated points.

    Args:
        elev: [..., 4] points on the sum-zero hyperplane.
    Returns:
        rem0:  [..., 4] the remainder-0 corner (float, multiples of 4).
        rank:  [..., 4] int32 descending residual rank (permutation of 0..3).
        w:     [..., 4] barycentric weights of the 4 simplex corners
               (corner k = rem0 + canonical_k), sum to 1.
    """
    # nearest remainder-0 point, greedily per coordinate
    v = elev / (D + 1.0)
    rd = jnp.round(v) * (D + 1.0)
    resid = elev - rd
    # descending rank (0 = largest residual), ties broken by index
    ii = jnp.arange(D + 1)
    greater = (resid[..., None, :] > resid[..., :, None]) | (
        (resid[..., None, :] == resid[..., :, None]) & (ii[None, :] < ii[:, None])
    )
    rank = jnp.sum(greater, axis=-1).astype(jnp.int32)  # [..., 4]
    # greedy sum may be off by h*(D+1); shift the h worst-ranked coords
    h = (jnp.sum(rd, axis=-1) / (D + 1.0)).astype(jnp.int32)  # [...]
    rank = rank + h[..., None]
    under = rank < 0
    over = rank > D
    rank = rank + (D + 1) * under.astype(jnp.int32) - (D + 1) * over.astype(jnp.int32)
    rd = rd + (D + 1.0) * under - (D + 1.0) * over

    # barycentric weights from the (implicitly sorted) residuals
    v2 = (elev - rd) / (D + 1.0)  # [..., 4]
    oh1 = jax.nn.one_hot(D - rank, D + 2, dtype=elev.dtype)  # [..., 4, 5]
    oh2 = jax.nn.one_hot(D + 1 - rank, D + 2, dtype=elev.dtype)
    b = jnp.sum((oh1 - oh2) * v2[..., None], axis=-2)  # [..., 5]
    w = b[..., : D + 1]
    w = w.at[..., 0].add(1.0 + b[..., D + 1])
    return rd, rank, w


# dW_k/d(elev_i) within a simplex: the one-hot scatter above, with the
# boundary fold b[D+1] -> W_0. Returned by _simplex_jac as M [..., 4i, 4k].
def _simplex_M(rank: jnp.ndarray, dtype) -> jnp.ndarray:
    oh1 = jax.nn.one_hot(D - rank, D + 2, dtype=dtype)
    oh2 = jax.nn.one_hot(D + 1 - rank, D + 2, dtype=dtype)
    M = (oh1 - oh2)[..., : D + 1]  # [..., 4i, 4k]
    fold = -(oh2[..., D + 1])  # -(rank == 0)
    M = M.at[..., 0].add(fold)
    return M / (D + 1.0)


# canonical simplex offsets: corner k, coordinate i gets +k, or k-(D+1) for
# the k highest-ranked coordinates (rank >= D+1-k)
_KS = np.arange(D + 1)  # [4k]


class PermutoEncoding(nn.Module):
    """Multi-resolution permutohedral hash encoding (drop-in for
    HashEncoding with half the table accesses)."""

    num_levels: int = 8
    min_res: int = 16
    max_res: int = 512
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    hash_init_scale: float = 1e-4
    table_dtype: str = "float32"

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def table_size(self) -> int:
        return 2**self.log2_hashmap_size

    @property
    def level_sizes(self) -> np.ndarray:
        """Hashed row count per level, capped at table_size. The A*_3
        lattice has ~(res+1)^3 sites over the unit cube at scale res
        (density comparable to the cubic grid); 2x headroom keeps coarse
        levels near-collision-free while bounding the backward
        segment-add's per-row query keys (ops/scatter.py)."""
        res = _level_resolutions(self.num_levels, self.min_res, self.max_res)
        est = 2 * (res.astype(np.int64) + 1) ** 3
        return np.minimum(est, self.table_size).astype(np.int64)

    @property
    def level_offsets(self) -> np.ndarray:
        return np.concatenate([[0], np.cumsum(self.level_sizes)])

    @property
    def total_rows(self) -> int:
        return int(self.level_offsets[-1])

    def corner_data(self, x: jnp.ndarray):
        """Flat table indices, weights, and weight jacobians for all levels.

        Args:
            x: [..., 3] positions (any range; lattice tiles all of R^3).
        Returns:
            idx [..., L, 4] int32, w [..., L, 4], dw_dx [..., L, 4, 3].
        """
        res = jnp.asarray(
            _level_resolutions(self.num_levels, self.min_res, self.max_res)
        ).astype(x.dtype)  # [L]
        scaled = x[..., None, :] * res[:, None]  # [..., L, 3]
        E = jnp.asarray(ELEVATE)
        elev = scaled @ E.T  # [..., L, 4]
        rem0, rank, w = _simplex(elev)

        # corner integer coordinates: [..., L, 4k, 4i]
        ks = jnp.asarray(_KS, jnp.int32)
        shift = jnp.where(
            rank[..., None, :] >= (D + 1) - ks[:, None], ks[:, None] - (D + 1), ks[:, None]
        )  # [..., L, 4k, 4i]
        coords = rem0.astype(jnp.int32)[..., None, :] + shift

        # hash the first 3 coordinates (the 4th is -sum of the others)
        u = coords.astype(jnp.uint32)
        primes = jnp.asarray(HASH_PRIMES)
        key = (u[..., 0] * primes[0]) ^ (u[..., 1] * primes[1]) ^ (
            u[..., 2] * primes[2]
        )  # [..., L, 4k]
        sizes = jnp.asarray(self.level_sizes.astype(np.uint32))[:, None]
        offsets = jnp.asarray(self.level_offsets[:-1].astype(np.int32))[:, None]
        idx = (key % sizes).astype(jnp.int32) + offsets  # [..., L, 4]

        # dW_k/dx_a = M[i, k]/(D+1) . E[i, a] . res_l
        M = _simplex_M(rank, x.dtype)  # [..., L, 4i, 4k]
        dw_dx = jnp.einsum("...ik,ia->...ka", M, E) * res[:, None, None]
        return idx, w, dw_dx

    @nn.compact
    def __call__(self, x: jnp.ndarray, want_jac: bool = False):
        table = self.param(
            "hash_table",
            lambda key, shape: (jax.random.uniform(key, shape) * 2.0 - 1.0)
            * self.hash_init_scale,
            (self.total_rows, self.features_per_level),
        )
        idx, w, dw_dx = self.corner_data(x)  # [..., L, 4] each

        batch = x.shape[:-1]
        L, FPL = self.num_levels, self.features_per_level
        K = L * (D + 1)
        idx_flat = idx.reshape(*batch, K)
        table_t = table.T  # [F, total_rows]
        if self.table_dtype != "float32":
            table_t = table_t.astype(self.table_dtype)
        feats = table_gather(table_t, idx_flat).astype(x.dtype)  # [F, ..., K]
        from jax.ad_checkpoint import checkpoint_name

        feats = checkpoint_name(feats, "permuto_corner_feats")

        def blend(wts):
            weighted = feats * wts.reshape(*batch, K)[None]
            per_level = jnp.sum(weighted.reshape(FPL, *batch, L, D + 1), axis=-1)
            return jnp.moveaxis(per_level, 0, -1).reshape(*batch, L * FPL)

        out = blend(w)
        if not want_jac:
            return out
        jac = jnp.stack([blend(dw_dx[..., a]) for a in range(3)], axis=-1)
        return out, jac  # [..., L*F], [..., L*F, 3]
