"""Generate KITTI-360 train/test splits by driving distance.

Functional spec: reference scripts/generate_kitti360_trainsplit.py — for
each (sequence, first_frame, last_frame) window, walk the vehicle poses,
keep a frame whenever the accumulated driving distance since the last
kept frame exceeds an interval (adapted upward when the car drives fast),
then alternate kept frames into train (even) / test (odd), dropping test
frames within 20 m of either window end. Unlike the reference (hard-coded
user paths + ``os.system cp``), this is a parameterized CLI that works on
any KITTI-360 checkout and uses shutil.

Outputs, per scene window k:
  <out>/train_k.txt, <out>/test_k.txt   image lists (KITTI-relative paths)
  <out>/train_k/..., <out>/test_k/...   copied stereo images (optional)
"""
from __future__ import annotations

import argparse
import shutil
from pathlib import Path

import numpy as np

# reference scripts/generate_kitti360_trainsplit.py:10-25
DEFAULT_TRAIN_SPLIT = (
    (0, 347, 450), (0, 3540, 3665), (0, 3820, 3937), (0, 6190, 6290),
    (0, 7840, 7940), (2, 5950, 6050), (2, 7490, 7595), (2, 8065, 8165),
    (4, 135, 212), (4, 382, 482), (4, 1385, 1486), (4, 1741, 1843),
    (5, 1130, 1240), (5, 1928, 2035),
)


def select_frames(frames, distances, interval_min=0.8):
    """Distance-interval frame selection (reference :62-86).

    Args:
        frames: frame ids present in the pose file, in order.
        distances: per-frame distance to the previous kept pose (first 0).
        interval_min: minimum spacing in meters.
    Returns:
        (train_frames, test_frames, cumulative_distances_of_selected)
    """
    distances = np.asarray(distances, dtype=np.float64)
    interval = max(interval_min, float(np.mean(distances)) - 0.5)
    total = float(np.sum(distances))

    selected, sel_dist = [], []
    acc = 0.0
    last_kept = None
    for k, frame in enumerate(frames):
        acc += float(distances[k])
        if last_kept is None or acc - last_kept >= interval:
            selected.append(frame)
            sel_dist.append(acc)
            last_kept = acc

    train = [f for i, f in enumerate(selected) if i % 2 == 0]
    test = [
        f for i, f in enumerate(selected)
        if i % 2 == 1 and 20.0 < sel_dist[i] < total - 20.0
    ]
    return train, test, sel_dist


def process_window(kitti_root: Path, out_dir: Path, scene_id: int, seq: int,
                   first: int, last: int, interval_min: float,
                   copy_images: bool) -> tuple[list, list]:
    drive = f"2013_05_28_drive_{seq:04d}_sync"
    poses = np.loadtxt(kitti_root / "data_poses" / drive / "poses.txt")
    present = set(poses[:, 0].astype(int).tolist())

    frames, distances = [], []
    prev = None
    for frame in range(first, last + 1):
        if frame not in present:
            continue
        frames.append(frame)
        pose = poses[poses[:, 0] == frame, 1:].reshape(3, 4)
        distances.append(0.0 if prev is None else
                         float(np.linalg.norm(pose[:3, 3] - prev[:3, 3])))
        prev = pose

    train, test, _ = select_frames(frames, distances, interval_min)

    for split, split_frames in (("train", train), ("test", test)):
        list_file = out_dir / f"{split}_{scene_id:02d}.txt"
        image_root = out_dir / f"{split}_{scene_id:02d}"
        with open(list_file, "w", encoding="utf8") as f:
            for frame in split_frames:
                rel = f"{drive}/image_00/data_rect/{frame:010d}.png"
                f.write(rel + "\n")
                if copy_images:
                    for cam in ("image_00", "image_01"):
                        src = (kitti_root / "data_2d_raw" / drive / cam /
                               "data_rect" / f"{frame:010d}.png")
                        dst_dir = image_root / drive / cam / "data_rect"
                        dst_dir.mkdir(parents=True, exist_ok=True)
                        if src.exists():
                            shutil.copy2(src, dst_dir / src.name)
    return train, test


def entrypoint():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--kitti-root", type=Path, required=True,
                    help="KITTI-360 root (contains data_poses/, data_2d_raw/)")
    ap.add_argument("--output-dir", type=Path,
                    default=Path("tmp_data/kitti360_trainsplit"))
    ap.add_argument("--distance-interval-min", type=float, default=0.8)
    ap.add_argument("--copy-images", action="store_true",
                    help="also copy the stereo png pairs into the split dirs")
    ap.add_argument("--window", action="append", default=None, metavar="SEQ,FIRST,LAST",
                    help="override the built-in windows (repeatable)")
    args = ap.parse_args()

    windows = DEFAULT_TRAIN_SPLIT
    if args.window:
        windows = tuple(tuple(int(v) for v in w.split(",")) for w in args.window)

    args.output_dir.mkdir(parents=True, exist_ok=True)
    for scene_id, (seq, first, last) in enumerate(windows):
        train, test, = process_window(
            args.kitti_root, args.output_dir, scene_id, seq, first, last,
            args.distance_interval_min, args.copy_images)
        print(f"scene {scene_id:02d} (seq {seq} [{first},{last}]): "
              f"{len(train)} train / {len(test)} test frames")


if __name__ == "__main__":
    entrypoint()
