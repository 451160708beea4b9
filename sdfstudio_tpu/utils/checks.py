"""Trace-time shape/dtype validation (SURVEY §4: runtime checking layer).

The reference leans on torch's eager shape errors; under ``jit`` a silently
broadcast wrong shape compiles fine and corrupts results. These asserts run
at TRACE time (shapes are static in XLA), so they cost nothing per step and
fire exactly once per compiled program.

``check_ray_bundle`` / ``check_ray_samples`` are called at the construction
boundaries (cameras.generate_rays, RayBundle.get_ray_samples). Disable
globally with ``sdfstudio_tpu.utils.checks.ENABLED = False`` or env
``SST_NO_CHECKS=1`` (e.g. when experimenting with exotic batch shapes).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

ENABLED = os.environ.get("SST_NO_CHECKS", "") != "1"


def assert_shape(x, spec: Sequence[Optional[int]], name: str = "array"):
    """``spec`` entries: int = exact, None = any. Extra leading batch dims
    are NOT allowed — the framework keeps flat [R, ...] batches."""
    if x is None or not ENABLED:
        return
    shape = tuple(x.shape)
    ok = len(shape) == len(spec) and all(
        s is None or s == d for s, d in zip(spec, shape)
    )
    if not ok:
        raise ValueError(
            f"{name}: expected shape {tuple(spec)} (None=any), got {shape}"
        )


def assert_same_leading(name_a, a, name_b, b):
    if a is None or b is None or not ENABLED:
        return
    if a.shape[0] != b.shape[0]:
        raise ValueError(
            f"{name_a} and {name_b} disagree on the ray count: "
            f"{a.shape[0]} vs {b.shape[0]}"
        )


def check_positions(x, name: str = "positions", dim: int = 3):
    """Fields-layer input contract: float array with last dim ``dim``.

    Wrong trailing dims broadcast silently under jit into garbage encodings
    (e.g. [N, 1] positions trilerp fine); this fires at trace time instead.
    """
    if x is None or not ENABLED:
        return
    if x.ndim < 1 or x.shape[-1] != dim:
        raise ValueError(
            f"{name}: expected trailing dim {dim}, got shape {tuple(x.shape)}"
        )
    if hasattr(x, "dtype") and x.dtype.kind != "f":
        raise ValueError(f"{name}: expected float dtype, got {x.dtype}")


def check_bins_weights(bins, weights, name: str = "pdf_sampler"):
    """Samplers-layer contract: bins [R, N+1] must bracket weights [R, N].
    An off-by-one here (e.g. passing starts instead of bin edges) would
    silently mis-index take_along_axis under jit."""
    if bins is None or weights is None or not ENABLED:
        return
    if bins.ndim != 2 or weights.ndim != 2:
        raise ValueError(
            f"{name}: bins/weights must be rank-2 [R, .], got "
            f"{tuple(bins.shape)} / {tuple(weights.shape)}"
        )
    if bins.shape[0] != weights.shape[0] or bins.shape[1] != weights.shape[1] + 1:
        raise ValueError(
            f"{name}: expected bins [R, N+1] vs weights [R, N], got "
            f"{tuple(bins.shape)} vs {tuple(weights.shape)}"
        )


def check_weights_values(weights, values, name: str = "renderer"):
    """Renderers-layer contract: per-sample vectors ``values [..., S, C]``
    composited by ``weights [..., S]``. A transposed or off-by-one sample
    axis broadcasts silently under jit (e.g. weights [R, S] vs rgb
    [R, 1, 3] composites every ray against sample 0)."""
    if weights is None or values is None or not ENABLED:
        return
    if values.ndim != weights.ndim + 1 or values.shape[:-1] != weights.shape:
        raise ValueError(
            f"{name}: values must be weights-shape + channel "
            f"([..., S, C]); got weights {tuple(weights.shape)} vs values "
            f"{tuple(values.shape)}"
        )


def check_sample_axis(name: str = "renderer", **arrays):
    """All per-sample scalar arrays ([..., S]) must agree exactly."""
    if not ENABLED:
        return
    items = [(k, v) for k, v in arrays.items() if v is not None]
    if not items:
        return
    ref_name, ref = items[0]
    for k, v in items[1:]:
        if tuple(v.shape) != tuple(ref.shape):
            raise ValueError(
                f"{name}: {k} {tuple(v.shape)} does not match "
                f"{ref_name} {tuple(ref.shape)}"
            )


def check_ray_bundle(rb):
    if not ENABLED:
        return
    r = rb.origins.shape[0] if rb.origins.ndim else None
    assert_shape(rb.origins, (r, 3), "RayBundle.origins")
    assert_shape(rb.directions, (r, 3), "RayBundle.directions")
    assert_shape(rb.pixel_area, (r, 1), "RayBundle.pixel_area")
    assert_shape(rb.nears, (r, 1), "RayBundle.nears")
    assert_shape(rb.fars, (r, 1), "RayBundle.fars")
    assert_shape(rb.directions_norm, (r, 1), "RayBundle.directions_norm")
    assert_shape(rb.times, (r, 1), "RayBundle.times")
    if rb.camera_indices is not None:
        # both [R] and [R, 1] are in circulation (embedding lookups broadcast)
        if tuple(rb.camera_indices.shape) not in ((r,), (r, 1)):
            raise ValueError(
                f"RayBundle.camera_indices: expected ({r},) or ({r}, 1), "
                f"got {tuple(rb.camera_indices.shape)}"
            )
        if rb.camera_indices.dtype.kind != "i":
            raise ValueError(
                f"RayBundle.camera_indices must be integer, got "
                f"{rb.camera_indices.dtype}"
            )


def check_ray_samples(rs):
    if not ENABLED:
        return
    r, s = rs.starts.shape[0], rs.starts.shape[-1]
    assert_shape(rs.starts, (r, s), "RaySamples.starts")
    assert_shape(rs.ends, (r, s), "RaySamples.ends")
    assert_shape(rs.origins, (r, 3), "RaySamples.origins")
    assert_shape(rs.directions, (r, 3), "RaySamples.directions")
    assert_shape(rs.spacing_starts, (r, s), "RaySamples.spacing_starts")
    assert_shape(rs.spacing_ends, (r, s), "RaySamples.spacing_ends")
    assert_shape(rs.s_near, (r, 1), "RaySamples.s_near")
    assert_shape(rs.s_far, (r, 1), "RaySamples.s_far")
