"""Convert neural-RGBD capture (poses.txt + depth pngs) to sdfstudio format.

Functional spec: reference scripts/datasets/process_neuralrgbd_to_sdfstudio.py —
sensor depth in millimeters scaled to the normalized scene, per-frame poses
from poses.txt (4x4 row blocks), scene normalized to the unit cube.
"""
from __future__ import annotations

import argparse
import json
from glob import glob
from pathlib import Path

import numpy as np


def load_poses(path: Path) -> np.ndarray:
    vals = np.loadtxt(path).reshape(-1, 4, 4)
    return vals


def main(input_dir: Path, output_dir: Path, depth_scale: float = 1000.0, scene_scale_mult: float = 1.1):
    from PIL import Image

    input_dir, output_dir = Path(input_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    image_paths = sorted(glob(str(input_dir / "images" / "*.png"))) or sorted(
        glob(str(input_dir / "rgb" / "*.png"))
    )
    depth_paths = sorted(glob(str(input_dir / "depth" / "*.png")))
    poses = load_poses(input_dir / "poses.txt")
    assert len(image_paths) == len(poses), (len(image_paths), len(poses))

    with Image.open(image_paths[0]) as im:
        W, H = im.size
    focal_file = input_dir / "focal.txt"
    focal = float(focal_file.read_text().strip()) if focal_file.exists() else 0.9 * W

    # normalize scene from camera positions
    centers = poses[:, :3, 3]
    lo, hi = centers.min(0), centers.max(0)
    center = (lo + hi) / 2
    scale = 2.0 / (np.max(hi - lo) * scene_scale_mult)
    poses = poses.copy()
    poses[:, :3, 3] = (poses[:, :3, 3] - center) * scale

    K4 = np.eye(4)
    K4[0, 0] = K4[1, 1] = focal
    K4[0, 2], K4[1, 2] = W / 2.0, H / 2.0

    frames = []
    for i, (img_path, pose) in enumerate(zip(image_paths, poses)):
        name = f"{i:06d}_rgb.png"
        Image.open(img_path).save(output_dir / name)
        frame = {
            "rgb_path": name,
            "camtoworld": pose.tolist(),
            "intrinsics": K4.tolist(),
        }
        if i < len(depth_paths):
            d = np.asarray(Image.open(depth_paths[i]), np.float32) / depth_scale * scale
            np.save(output_dir / f"{i:06d}_sensor_depth.npy", d)
            frame["sensor_depth_path"] = f"{i:06d}_sensor_depth.npy"
        frames.append(frame)

    meta = {
        "camera_model": "OPENCV",
        "height": H,
        "width": W,
        "has_mono_prior": False,
        "has_sensor_depth": bool(depth_paths),
        "has_foreground_mask": False,
        "has_sparse_sfm_points": False,
        "worldtogt": np.linalg.inv(
            np.diag([scale, scale, scale, 1.0])
            @ np.block([[np.eye(3), -center[:, None]], [np.zeros((1, 3)), np.ones((1, 1))]])
        ).tolist(),
        "scene_box": {
            "aabb": [[-1, -1, -1], [1, 1, 1]],
            "near": 0.05,
            "far": 2.5,
            "radius": 1.0,
            "collider_type": "near_far",
        },
        "frames": frames,
    }
    (output_dir / "meta_data.json").write_text(json.dumps(meta, indent=1))
    print(f"wrote {len(frames)} frames (sensor depth: {bool(depth_paths)})")


def entrypoint():
    p = argparse.ArgumentParser()
    p.add_argument("--input-dir", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--depth-scale", type=float, default=1000.0)
    a = p.parse_args()
    main(a.input_dir, a.output_dir, a.depth_scale)


if __name__ == "__main__":
    entrypoint()
