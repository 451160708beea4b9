"""Dataset-preparation scripts: KITTI-360 splits, heritage masks,
monocular cues, nuscenes box rasterization, shell completions.

Reference specs: scripts/generate_kitti360_trainsplit.py,
scripts/heritage_to_nerfstudio.py, scripts/datasets/*.py,
scripts/completions/install.py.
"""
import subprocess
import sys

import numpy as np
import pytest


# --- kitti360 trainsplit ----------------------------------------------------

def _write_kitti_poses(root, seq, frames_xyz):
    drive = f"2013_05_28_drive_{seq:04d}_sync"
    pose_dir = root / "data_poses" / drive
    pose_dir.mkdir(parents=True)
    rows = []
    for frame, xyz in frames_xyz:
        pose = np.hstack([np.eye(3), np.asarray(xyz, float).reshape(3, 1)])
        rows.append(np.concatenate([[frame], pose.ravel()]))
    np.savetxt(pose_dir / "poses.txt", np.array(rows))


def test_kitti360_split_by_distance(tmp_path):
    from sdfstudio_tpu.scripts.generate_kitti360_trainsplit import process_window

    # car drives along +x at 1 m/frame for 100 frames
    _write_kitti_poses(tmp_path, 0, [(f, (f, 0, 0)) for f in range(100)])
    out = tmp_path / "out"
    out.mkdir()
    train, test = process_window(tmp_path, out, 0, 0, 0, 99,
                                 interval_min=0.8, copy_images=False)
    # mean spacing 1m -> interval max(0.8, 1-0.5)=0.8 -> every frame kept,
    # alternating into train/test; test trimmed to (20, total-20) meters
    assert len(train) > 20
    assert all(20.0 < f < 79.0 or f in train for f in test)
    assert set(train).isdisjoint(test)
    listed = (out / "train_00.txt").read_text().strip().splitlines()
    assert len(listed) == len(train)
    assert listed[0].endswith(".png")


def test_kitti360_fast_driving_widens_interval(tmp_path):
    from sdfstudio_tpu.scripts.generate_kitti360_trainsplit import select_frames

    frames = list(range(50))
    # 5 m/frame: interval becomes mean-0.5 = 4.5 -> still every frame
    train_fast, _, sel = select_frames(frames, [0.0] + [5.0] * 49)
    assert len(train_fast) >= 20
    # 0.1 m/frame: interval floors at 0.8 -> keep every 8th frame
    train_slow, _, _ = select_frames(frames, [0.0] + [0.1] * 49)
    assert len(train_slow) <= 4


# --- heritage masks ---------------------------------------------------------

def test_sphere_visibility_mask_silhouette():
    from sdfstudio_tpu.scripts.heritage_to_nerfstudio import sphere_visibility_mask

    # camera at z=-4 looking +z at a unit sphere at origin: the mask is a
    # centered disc of angular radius asin(1/4)
    c2w = np.eye(4)
    c2w[2, 3] = -4.0
    W = H = 65
    f = 100.0
    mask = sphere_visibility_mask(W, H, f, f, W / 2, H / 2, c2w,
                                  origin=(0, 0, 0), radius=1.0)
    assert mask[H // 2, W // 2]  # center pixel hits
    assert not mask[0, 0]        # corner misses
    # radius in pixels: f * tan(asin(1/4)) ~ 25.8
    xs = np.nonzero(mask[H // 2])[0]
    measured_r = (xs.max() - xs.min()) / 2
    assert abs(measured_r - 100.0 * np.tan(np.arcsin(0.25))) < 1.5


def test_camera_inside_sphere_sees_everything():
    from sdfstudio_tpu.scripts.heritage_to_nerfstudio import sphere_visibility_mask

    c2w = np.eye(4)  # camera AT the sphere center
    mask = sphere_visibility_mask(16, 16, 10.0, 10.0, 8, 8, c2w,
                                  origin=(0, 0, 0), radius=1.0)
    assert mask.all()


def test_heritage_scene_end_to_end(tmp_path):
    import yaml

    from sdfstudio_tpu.scripts.heritage_to_nerfstudio import process_scene

    scene = tmp_path
    sparse = scene / "sparse"
    sparse.mkdir()
    (scene / "config.yaml").write_text(yaml.dump({
        "radius": 1.0, "origin": [0.0, 0.0, 0.0],
        "voxel_size": 0.05, "min_track_length": 1}))
    (sparse / "cameras.txt").write_text(
        "1 PINHOLE 32 24 40.0 40.0 16.0 12.0\n")
    # w2c tvec=(0,0,3) -> camera at z=-3 looking +z toward the sphere
    (sparse / "images.txt").write_text(
        "1 1 0 0 0 0 0 3 1 view0.jpg\n\n")
    # two well-tracked points inside the sphere, one outlier outside
    (sparse / "points3D.txt").write_text(
        "1 0.1 0.2 0.0 255 0 0 0.5 1 0 1 1 1 2\n"
        "2 -0.3 0.0 0.1 0 255 0 0.5 1 3 1 4 1 5\n"
        "3 9.0 9.0 9.0 0 0 255 0.5 1 6 1 7\n")
    n = process_scene(scene, sfm="sparse")
    assert n == 1
    mask = np.load(scene / "masks" / "view0.npy")
    assert mask.shape == (24, 32)
    assert mask[12, 16] and not mask[0, 0]
    # voxelized cloud written, all centers within the sphere bounds
    from sdfstudio_tpu.utils.mesh_io import read_ply

    pts = read_ply(scene / "sparse_voxels.ply").vertices
    assert len(pts) > 0
    assert np.abs(pts).max() <= 1.0 + 1e-6


# --- monocular cues ---------------------------------------------------------

def test_depth_gradient_normals(tmp_path):
    from sdfstudio_tpu.scripts.datasets.extract_monocular_cues import (
        normals_from_depth,
        run_depth_gradient,
    )

    # a tilted plane: depth increases along u -> normal tips toward -x
    u = np.linspace(0, 1, 32)
    depth = np.tile(u, (24, 1)).astype(np.float32)
    n = normals_from_depth(depth) * 2.0 - 1.0  # back to [-1,1]
    assert n.shape == (3, 24, 32)
    assert n[0, 12, 16] < -0.01          # x component negative
    assert abs(n[1, 12, 16]) < 1e-6      # no y tilt
    np.testing.assert_allclose(np.linalg.norm(n, axis=0), 1.0, atol=1e-5)

    np.save(tmp_path / "000000_depth.npy", depth)
    out = tmp_path / "cues"
    out.mkdir()
    assert run_depth_gradient(tmp_path, out) == 1
    written = np.load(out / "000000_normal.npy")
    assert written.shape == (3, 24, 32)
    assert (out / "000000_normal.png").exists()


def test_standardize_depth_map():
    from sdfstudio_tpu.scripts.datasets.extract_monocular_cues import (
        standardize_depth_map,
    )

    rng = np.random.default_rng(0)
    img = rng.normal(5.0, 2.0, size=(64, 64))
    std = standardize_depth_map(img)
    assert abs(float(std.mean())) < 0.2
    assert 0.5 < float(std.std()) < 2.0


# --- nuscenes box rasterization ----------------------------------------------

def test_fill_convex_quads_masks_cuboid():
    pytest.importorskip("cv2")
    from sdfstudio_tpu.scripts.datasets.process_nuscenes_masks import (
        fill_convex_quads,
    )

    mask = np.ones((100, 100), dtype=np.uint8)
    # an axis-aligned box projected to two offset squares
    front = [(20, 20), (60, 20), (60, 60), (20, 60)]
    back = [(30, 30), (70, 30), (70, 70), (30, 70)]
    fill_convex_quads(mask, np.array(front + back))
    assert mask[40, 40] == 0      # inside
    assert mask[65, 65] == 0      # inside back face
    assert mask[90, 90] == 1      # outside untouched
    assert mask[5, 5] == 1


# --- completions -------------------------------------------------------------

def test_completions_generate_and_parse(tmp_path):
    from sdfstudio_tpu.scripts.completions.install import generate_bash, generate_zsh

    bash = generate_bash(tmp_path)
    zsh = generate_zsh(tmp_path)
    text = bash.read_text()
    assert "neus-facto" in text and "sdfstudio-data" in text
    assert "complete -F _sst_train sst-train" in text
    assert "--load-config" in text  # options harvested from argparse
    # the generated file must be valid bash
    subprocess.run(["bash", "-n", str(bash)], check=True)
    assert "bashcompinit" in zsh.read_text()
