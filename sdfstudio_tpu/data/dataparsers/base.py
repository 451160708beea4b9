"""Dataparser base types.

Functional spec: reference nerfstudio/data/dataparsers/base_dataparser.py.
Outputs are host-side numpy plus a Cameras pytree; the datamanager moves
everything to device once.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from sdfstudio_tpu.cameras.cameras import Cameras
from sdfstudio_tpu.core.scene_box import SceneBox


@dataclasses.dataclass
class DataparserOutputs:
    """Parsed dataset (reference base_dataparser.py DataparserOutputs)."""

    image_filenames: List[Path]
    cameras: Cameras
    scene_box: SceneBox
    alpha_color: Optional[np.ndarray] = None
    mask_filenames: Optional[List[Path]] = None
    depths: Optional[List[np.ndarray]] = None  # mono depth per image [H, W]
    normals: Optional[List[np.ndarray]] = None  # mono world-space normal [H, W, 3]
    sensor_depths: Optional[List[np.ndarray]] = None
    fg_masks: Optional[List[np.ndarray]] = None  # [H, W, 1] in [0, 1]
    sparse_sfm_points: Optional[List[np.ndarray]] = None  # per-view [P_i, 3]
    pairs_srcs: Optional[np.ndarray] = None  # [N, 1+num_src] patch-warp sources
    metadata: Dict = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class DataParserConfig:
    data: Path = Path(".")


class DataParser:
    """Base parser: subclasses implement _generate_dataparser_outputs."""

    config: DataParserConfig

    def __init__(self, config: DataParserConfig):
        self.config = config

    def get_dataparser_outputs(self, split: str = "train") -> DataparserOutputs:
        return self._generate_dataparser_outputs(split)

    def _generate_dataparser_outputs(self, split: str = "train") -> DataparserOutputs:
        raise NotImplementedError


def load_image(path: Path) -> np.ndarray:
    """uint8 image file -> float32 [H, W, C] in [0, 1]."""
    from PIL import Image

    img = np.asarray(Image.open(path), dtype=np.float32) / 255.0
    if img.ndim == 2:
        img = img[..., None]
    return img
