"""Convert a nerfstudio-format capture (transforms.json) to sdfstudio format
(meta_data.json).

Functional spec: reference scripts/datasets/process_nerfstudio_to_sdfstudio.py —
OpenGL->OpenCV pose conversion, scene normalization to the unit cube (object:
x1.05 margin, indoor: x5 sphere), optional image resize/crop, per-frame
intrinsics, mono-prior placeholders.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(
    input_dir: Path,
    output_dir: Path,
    data_type: str = "colmap",  # colmap | polycam
    scene_type: str = "object",  # object | indoor | unbound
    scene_scale_mult: float | None = None,
    target_size: int | None = None,
):
    from PIL import Image

    input_dir, output_dir = Path(input_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    cam_params = json.loads((input_dir / "transforms.json").read_text())

    shared_K = None
    if data_type == "colmap":
        shared_K = np.array(
            [
                [cam_params["fl_x"], 0, cam_params["cx"]],
                [0, cam_params["fl_y"], cam_params["cy"]],
                [0, 0, 1],
            ]
        )

    poses, image_paths, intrinsics = [], [], []
    for frame in cam_params["frames"]:
        if data_type == "polycam":
            intrinsics.append(
                np.array(
                    [
                        [frame["fl_x"], 0, frame["cx"]],
                        [0, frame["fl_y"], frame["cy"]],
                        [0, 0, 1],
                    ]
                )
            )
        else:
            intrinsics.append(shared_K)
        c2w = np.asarray(frame["transform_matrix"], np.float64).reshape(4, 4)
        c2w[0:3, 1:3] *= -1  # OpenGL -> OpenCV
        poses.append(c2w)
        file_path = Path(frame["file_path"])
        img_path = input_dir / "images" / file_path.name
        if not img_path.exists():
            img_path = input_dir / file_path
        image_paths.append(img_path)

    poses = np.asarray(poses)
    valid = np.isfinite(poses).all(axis=(1, 2))
    centers = poses[valid, :3, 3]
    min_v, max_v = centers.min(axis=0), centers.max(axis=0)

    if scene_type in ("indoor", "object"):
        mult = scene_scale_mult or (1.05 if scene_type == "object" else 5.0)
        center = (min_v + max_v) / 2.0
        scale = 2.0 / (np.max(max_v - min_v) * mult)
        poses[:, :3, 3] = (poses[:, :3, 3] - center) * scale
        scene_box = {
            "aabb": [[-1, -1, -1], [1, 1, 1]],
            "near": 0.05,
            "far": 2.5,
            "radius": 1.0,
            "collider_type": "box" if scene_type == "object" else "near_far",
        }
        worldtogt = np.linalg.inv(
            np.diag([scale, scale, scale, 1.0]) @ np.block(
                [[np.eye(3), -center[:, None]], [np.zeros((1, 3)), np.ones((1, 1))]]
            )
        )
    else:
        scene_box = {
            "aabb": [[-1, -1, -1], [1, 1, 1]],
            "near": 0.05,
            "far": 1000.0,
            "radius": 1.0,
            "collider_type": "near_far",
        }
        worldtogt = np.eye(4)

    frames_out = []
    sample = Image.open(image_paths[0])
    W, H = sample.size
    if target_size:
        scale_img = target_size / min(W, H)
    else:
        scale_img = 1.0

    for i, (pose, K, img_path) in enumerate(zip(poses, intrinsics, image_paths)):
        out_name = f"{i:06d}_rgb.png"
        img = Image.open(img_path)
        K = K.copy().astype(np.float64)
        if scale_img != 1.0:
            img = img.resize((int(W * scale_img), int(H * scale_img)), Image.LANCZOS)
            K[:2] *= scale_img
        img.save(output_dir / out_name)
        K4 = np.eye(4)
        K4[:3, :3] = K
        frames_out.append(
            {
                "rgb_path": out_name,
                "camtoworld": pose.tolist(),
                "intrinsics": K4.tolist(),
            }
        )

    meta = {
        "camera_model": "OPENCV",
        "height": img.size[1],
        "width": img.size[0],
        "has_mono_prior": False,
        "has_sensor_depth": False,
        "has_foreground_mask": False,
        "has_sparse_sfm_points": False,
        "worldtogt": np.asarray(worldtogt).tolist(),
        "scene_box": scene_box,
        "frames": frames_out,
    }
    (output_dir / "meta_data.json").write_text(json.dumps(meta, indent=1))
    print(f"wrote {len(frames_out)} frames to {output_dir}")


def entrypoint():
    p = argparse.ArgumentParser()
    p.add_argument("--input-dir", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--data-type", default="colmap", choices=["colmap", "polycam"])
    p.add_argument("--scene-type", default="object", choices=["object", "indoor", "unbound"])
    p.add_argument("--scene-scale-mult", type=float, default=None)
    p.add_argument("--target-size", type=int, default=None)
    a = p.parse_args()
    main(a.input_dir, a.output_dir, a.data_type, a.scene_type, a.scene_scale_mult, a.target_size)


if __name__ == "__main__":
    entrypoint()
