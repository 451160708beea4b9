"""Render dynamic-object masks for NuScenes from cuboid annotations.

Functional spec: reference scripts/datasets/process_nuscenes_masks.py —
for every camera sample, project the 3D boxes of objects that move in
ANY frame (peak speed >= velocity threshold over the instance's
annotation chain) into the image and rasterize all six cuboid faces to
0 in a 900x1600 mask (1 = keep), written to
``<output>/masks/CAM_*/<image>.png``.

The NuScenes devkit is an optional dependency here (not part of this
framework's pinned environment): the script degrades with a clear error
when it is absent, while `fill_convex_quads` (pure numpy/cv2 box-face
rasterization, reference :92-98) stays importable and unit-testable
without it.
"""
from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def fill_convex_quads(mask: np.ndarray, corners_2d: np.ndarray) -> None:
    """Rasterize the six faces of a projected cuboid to 0, in place.

    Args:
        mask: [H, W] uint8, 1 = keep.
        corners_2d: [8, 2] int pixel coordinates in the devkit's corner
            order (0-3 front face, 4-7 back face).
    """
    import cv2

    c = np.round(np.asarray(corners_2d)).astype(np.int32)
    for face in ((0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4),
                 (2, 3, 7, 6), (0, 3, 7, 4), (1, 2, 6, 5)):
        cv2.fillPoly(mask, [c[list(face)]], 0)


def instance_is_dynamic(nusc, instance, velocity_thresh: float) -> bool:
    """True if the instance exceeds the speed threshold in any frame."""
    ann_token = instance["first_annotation_token"]
    while ann_token:
        velocity = nusc.box_velocity(ann_token)
        if np.linalg.norm(velocity) >= velocity_thresh:
            return True
        ann_token = nusc.get("sample_annotation", ann_token)["next"]
    return False


def process(data_dir: Path, output_dir: Path, version: str = "v1.0-mini",
            velocity_thresh: float = 0.75,
            cameras=("FRONT", "FRONT_LEFT", "FRONT_RIGHT",
                     "BACK", "BACK_LEFT", "BACK_RIGHT")) -> None:
    try:
        from nuscenes.nuscenes import NuScenes as NuScenesDatabase
        from nuscenes.utils.geometry_utils import BoxVisibility, view_points
    except ImportError as e:  # pragma: no cover - env-dependent
        raise SystemExit(
            "process_nuscenes_masks requires the `nuscenes-devkit` package "
            "(pip install nuscenes-devkit) — not found in this environment."
        ) from e
    import cv2

    nusc = NuScenesDatabase(version=version, dataroot=str(data_dir))
    cam_names = ["CAM_" + c for c in cameras]
    for cam in cam_names:
        (output_dir / "masks" / cam).mkdir(parents=True, exist_ok=True)

    dynamic = {
        inst["token"]: instance_is_dynamic(nusc, inst, velocity_thresh)
        for inst in nusc.instance
    }

    samples = sorted(nusc.sample,
                     key=lambda s: (s["scene_token"], s["timestamp"]))
    for sample in samples:
        for cam in cam_names:
            camera_data = nusc.get("sample_data", sample["data"][cam])
            sensor = nusc.get("calibrated_sensor",
                              camera_data["calibrated_sensor_token"])
            intrinsics = np.array(sensor["camera_intrinsic"])

            _, boxes, _ = nusc.get_sample_data(
                sample["data"][cam], box_vis_level=BoxVisibility.ANY)

            mask = np.ones((900, 1600), dtype=np.uint8)
            for box in boxes:
                token = nusc.get("sample_annotation", box.token)["instance_token"]
                if not dynamic[token]:
                    continue
                corners = view_points(box.corners(), intrinsics,
                                      normalize=True)[:2].T
                fill_convex_quads(mask, corners)

            name = os.path.split(camera_data["filename"])[1].replace(
                "jpg", "png")
            cv2.imwrite(str(output_dir / "masks" / cam / name), mask * 255)


def entrypoint():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--data-dir", type=Path, required=True)
    ap.add_argument("--output-dir", type=Path, required=True)
    ap.add_argument("--version", default="v1.0-mini",
                    choices=["v1.0-mini", "v1.0-trainval"])
    ap.add_argument("--velocity-thresh", type=float, default=0.75)
    args = ap.parse_args()
    process(args.data_dir, args.output_dir, args.version,
            args.velocity_thresh)


if __name__ == "__main__":
    entrypoint()
