"""Colormap helpers for visualization.

Functional spec: reference nerfstudio/utils/colormaps.py (apply_colormap,
apply_depth_colormap) — matplotlib-free turbo/viridis approximations.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

# 9-point turbo control colors, linearly interpolated
_TURBO = np.array(
    [
        [0.18995, 0.07176, 0.23217],
        [0.25107, 0.25237, 0.63374],
        [0.27628, 0.42118, 0.89123],
        [0.25862, 0.57958, 0.99876],
        [0.15844, 0.73551, 0.92305],
        [0.09267, 0.86554, 0.7623],
        [0.19659, 0.94901, 0.59466],
        [0.42778, 0.99419, 0.38575],
        [0.64362, 0.98999, 0.23356],
        [0.80473, 0.92452, 0.20459],
        [0.93301, 0.81236, 0.22667],
        [0.99314, 0.67408, 0.20348],
        [0.9836, 0.49291, 0.12849],
        [0.92105, 0.31489, 0.05475],
        [0.81608, 0.18462, 0.01809],
        [0.66449, 0.08436, 0.00424],
        [0.4796, 0.01583, 0.01055],
    ]
)


def apply_colormap(values: np.ndarray, cmap: str = "turbo") -> np.ndarray:
    """[..., 1] scalar map in [0,1] -> [..., 3] rgb."""
    v = np.clip(np.asarray(values)[..., 0], 0.0, 1.0)
    idx = v * (len(_TURBO) - 1)
    lo = np.floor(idx).astype(int)
    hi = np.clip(lo + 1, 0, len(_TURBO) - 1)
    w = (idx - lo)[..., None]
    return _TURBO[lo] * (1 - w) + _TURBO[hi] * w


def apply_depth_colormap(
    depth: np.ndarray,
    accumulation: Optional[np.ndarray] = None,
    near_plane: Optional[float] = None,
    far_plane: Optional[float] = None,
) -> np.ndarray:
    """Normalize depth then colormap; modulate by accumulation
    (reference colormaps.py:apply_depth_colormap)."""
    depth = np.asarray(depth)
    near = near_plane if near_plane is not None else float(np.min(depth))
    far = far_plane if far_plane is not None else float(np.max(depth))
    scaled = (depth - near) / max(far - near, 1e-10)
    colored = apply_colormap(np.clip(scaled, 0, 1))
    if accumulation is not None:
        colored = colored * np.asarray(accumulation)
    return colored
