"""Convert a ScanNet scene export to sdfstudio format.

Functional spec: reference scripts/datasets/process_scannet_to_sdfstudio.py —
color/ + depth/ + pose/ + intrinsic/intrinsic_color.txt layout; frames
subsampled, resized+center-cropped to 384 (omnidata-compatible), scene
normalized to the unit cube; sensor depth scaled to the normalized scene.
"""
from __future__ import annotations

import argparse
import json
from glob import glob
from pathlib import Path

import numpy as np


def main(
    input_dir: Path,
    output_dir: Path,
    sample_every: int = 10,
    target_size: int = 384,
    scene_scale_mult: float = 1.1,
    include_depth: bool = True,
):
    from PIL import Image

    input_dir, output_dir = Path(input_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    color = sorted(glob(str(input_dir / "color" / "*.jpg")), key=lambda p: int(Path(p).stem))
    depth = sorted(glob(str(input_dir / "depth" / "*.png")), key=lambda p: int(Path(p).stem))
    pose = sorted(glob(str(input_dir / "pose" / "*.txt")), key=lambda p: int(Path(p).stem))
    K = np.loadtxt(input_dir / "intrinsic" / "intrinsic_color.txt")[:3, :3]

    idx = list(range(0, len(color), sample_every))
    poses = np.stack([np.loadtxt(pose[i]) for i in idx])
    valid = np.isfinite(poses).all(axis=(1, 2))
    idx = [i for i, v in zip(idx, valid) if v]
    poses = poses[valid]

    centers = poses[:, :3, 3]
    lo, hi = centers.min(0), centers.max(0)
    center = (lo + hi) / 2
    scale = 2.0 / (np.max(hi - lo) * scene_scale_mult)
    poses[:, :3, 3] = (poses[:, :3, 3] - center) * scale

    with Image.open(color[0]) as im:
        W, H = im.size
    # resize short side to target, center crop square (the omnidata recipe)
    s = target_size / min(W, H)
    newW, newH = int(round(W * s)), int(round(H * s))
    ox, oy = (newW - target_size) // 2, (newH - target_size) // 2
    K = K.copy()
    K[:2] *= s
    K[0, 2] -= ox
    K[1, 2] -= oy
    K4 = np.eye(4)
    K4[:3, :3] = K

    frames = []
    for out_i, i in enumerate(idx):
        name = f"{out_i:06d}_rgb.png"
        img = Image.open(color[i]).resize((newW, newH), Image.LANCZOS)
        img = img.crop((ox, oy, ox + target_size, oy + target_size))
        img.save(output_dir / name)
        frame = {
            "rgb_path": name,
            "camtoworld": poses[out_i].tolist(),
            "intrinsics": K4.tolist(),
        }
        if include_depth and i < len(depth):
            d = Image.open(depth[i]).resize((newW, newH), Image.NEAREST)
            d = d.crop((ox, oy, ox + target_size, oy + target_size))
            d = np.asarray(d, np.float32) / 1000.0 * scale
            np.save(output_dir / f"{out_i:06d}_sensor_depth.npy", d)
            frame["sensor_depth_path"] = f"{out_i:06d}_sensor_depth.npy"
        frames.append(frame)

    meta = {
        "camera_model": "OPENCV",
        "height": target_size,
        "width": target_size,
        "has_mono_prior": False,
        "has_sensor_depth": include_depth,
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
            "collider_type": "box",
        },
        "frames": frames,
    }
    (output_dir / "meta_data.json").write_text(json.dumps(meta, indent=1))
    print(f"wrote {len(frames)} frames")


def entrypoint():
    p = argparse.ArgumentParser()
    p.add_argument("--input-dir", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--sample-every", type=int, default=10)
    a = p.parse_args()
    main(a.input_dir, a.output_dir, a.sample_every)


if __name__ == "__main__":
    entrypoint()
