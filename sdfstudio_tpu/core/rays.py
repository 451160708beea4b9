"""Ray data structures as JAX pytrees.

TPU-native redesign of the reference ray containers
(/root/reference/nerfstudio/cameras/rays.py:29-339). Instead of a
TensorDataclass hierarchy with nested Frustums, we keep two flat
`flax.struct` pytrees with static shapes:

* ``RayBundle``: per-ray quantities, shape ``[R, ...]``.
* ``RaySamples``: per-sample quantities, shape ``[R, S, ...]``; sample
  positions are derived on the fly (cheap recompute beats HBM traffic).

The reference attaches a Python callable ``spacing_to_euclidean_fn`` to each
RaySamples (rays.py:123). Under jit we cannot carry closures in a pytree, so
the warp is reified as a static ``spacing_kind`` string plus the transformed
near/far arrays ``s_near``/``s_far`` — together they define
``euclidean = inv_warp(x * s_far + (1 - x) * s_near)`` exactly as
ray_samplers.py:115-117 does.

Volume rendering math (reference rays.py:131-230) lives in
:mod:`sdfstudio_tpu.ops.render` as pure functions.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import struct

from sdfstudio_tpu.utils import checks

# ---------------------------------------------------------------------------
# Spacing warps (ray_samplers.py:130-247): map euclidean distance t -> s in a
# warped space where uniform sampling has the desired density.
# ---------------------------------------------------------------------------

SPACING_UNIFORM = "uniform"
SPACING_LINDISP = "lindisp"
SPACING_SQRT = "sqrt"
SPACING_LOG = "log"
SPACING_PIECEWISE = "piecewise"  # UniformLinDispPiecewiseSampler
SPACING_EUCLIDEAN = "euclidean"  # identity; used for euclidean-space merges


def spacing_fn(kind: str, x: jnp.ndarray) -> jnp.ndarray:
    """Warp euclidean distance into spacing coordinates."""
    if kind in (SPACING_UNIFORM, SPACING_EUCLIDEAN):
        return x
    if kind == SPACING_LINDISP:
        return 1.0 / x
    if kind == SPACING_SQRT:
        return jnp.sqrt(x)
    if kind == SPACING_LOG:
        return jnp.log(x)
    if kind == SPACING_PIECEWISE:
        return jnp.where(x < 1, x / 2, 1 - 1 / (2 * x))
    raise ValueError(f"unknown spacing kind: {kind}")


def spacing_fn_inv(kind: str, x: jnp.ndarray) -> jnp.ndarray:
    """Inverse warp: spacing coordinates back to euclidean distance."""
    if kind in (SPACING_UNIFORM, SPACING_EUCLIDEAN):
        return x
    if kind == SPACING_LINDISP:
        return 1.0 / x
    if kind == SPACING_SQRT:
        return x**2
    if kind == SPACING_LOG:
        return jnp.exp(x)
    if kind == SPACING_PIECEWISE:
        return jnp.where(x < 0.5, 2 * x, 1 / (2 - 2 * x))
    raise ValueError(f"unknown spacing kind: {kind}")


@struct.dataclass
class RayBundle:
    """A batch of rays. All arrays have leading shape ``[R]``.

    Mirrors reference RayBundle (rays.py:234-254)."""

    origins: jnp.ndarray  # [R, 3]
    directions: jnp.ndarray  # [R, 3] unit direction
    pixel_area: jnp.ndarray  # [R, 1]
    nears: Optional[jnp.ndarray] = None  # [R, 1]
    fars: Optional[jnp.ndarray] = None  # [R, 1]
    camera_indices: Optional[jnp.ndarray] = None  # [R] int32
    directions_norm: Optional[jnp.ndarray] = None  # [R, 1]
    times: Optional[jnp.ndarray] = None  # [R, 1]
    metadata: Optional[Dict[str, Any]] = None

    @property
    def num_rays(self) -> int:
        return self.origins.shape[0]

    def get_ray_samples(
        self,
        euclidean_bins: jnp.ndarray,  # [R, S+1]
        spacing_bins: Optional[jnp.ndarray] = None,  # [R, S+1]
        spacing_kind: str = SPACING_EUCLIDEAN,
        s_near: Optional[jnp.ndarray] = None,  # [R, 1]
        s_far: Optional[jnp.ndarray] = None,  # [R, 1]
    ) -> "RaySamples":
        """Build RaySamples from bin edges (reference rays.py:295-339)."""
        if spacing_bins is None:
            spacing_bins = euclidean_bins
        checks.check_ray_bundle(self)
        samples = RaySamples(
            origins=self.origins,
            directions=self.directions,
            pixel_area=self.pixel_area,
            camera_indices=self.camera_indices,
            starts=euclidean_bins[..., :-1],
            ends=euclidean_bins[..., 1:],
            spacing_starts=spacing_bins[..., :-1],
            spacing_ends=spacing_bins[..., 1:],
            s_near=s_near,
            s_far=s_far,
            spacing_kind=spacing_kind,
            times=self.times,
            metadata=self.metadata,
        )
        checks.check_ray_samples(samples)
        return samples


@struct.dataclass
class RaySamples:
    """Samples along rays; per-sample arrays have shape ``[R, S]``.

    Flattened union of the reference's Frustums + RaySamples
    (rays.py:29-130)."""

    origins: jnp.ndarray  # [R, 3]
    directions: jnp.ndarray  # [R, 3]
    pixel_area: jnp.ndarray  # [R, 1]
    starts: jnp.ndarray  # [R, S] euclidean bin starts
    ends: jnp.ndarray  # [R, S] euclidean bin ends
    spacing_starts: Optional[jnp.ndarray] = None  # [R, S] in [0, 1]
    spacing_ends: Optional[jnp.ndarray] = None  # [R, S]
    s_near: Optional[jnp.ndarray] = None  # [R, 1] warped near
    s_far: Optional[jnp.ndarray] = None  # [R, 1] warped far
    camera_indices: Optional[jnp.ndarray] = None  # [R]
    times: Optional[jnp.ndarray] = None
    metadata: Optional[Dict[str, Any]] = None
    spacing_kind: str = struct.field(pytree_node=False, default=SPACING_EUCLIDEAN)

    @property
    def num_rays(self) -> int:
        return self.starts.shape[0]

    @property
    def num_samples(self) -> int:
        return self.starts.shape[-1]

    @property
    def deltas(self) -> jnp.ndarray:  # [R, S]
        return self.ends - self.starts

    def get_positions(self) -> jnp.ndarray:
        """Frustum-center positions [R, S, 3] (reference rays.py:46-55)."""
        mids = (self.starts + self.ends) * 0.5
        return self.origins[..., None, :] + self.directions[..., None, :] * mids[..., None]

    def get_start_positions(self) -> jnp.ndarray:
        """Bin-start positions [R, S, 3] (reference rays.py:61-73).

        SDF methods evaluate at bin starts so that merged resampling can
        reuse SDF evaluations."""
        return self.origins[..., None, :] + self.directions[..., None, :] * self.starts[..., None]

    def spacing_to_euclidean(self, x: jnp.ndarray) -> jnp.ndarray:
        """Map normalized spacing coords in [0,1] to euclidean distance
        (reference ray_samplers.py:116)."""
        if self.spacing_kind == SPACING_EUCLIDEAN or self.s_near is None:
            return x
        s = x * self.s_far + (1.0 - x) * self.s_near
        return spacing_fn_inv(self.spacing_kind, s)

    def to_bundle(self) -> RayBundle:
        """Recover the per-ray bundle view (for resampling)."""
        return RayBundle(
            origins=self.origins,
            directions=self.directions,
            pixel_area=self.pixel_area,
            camera_indices=self.camera_indices,
            times=self.times,
            metadata=self.metadata,
        )
