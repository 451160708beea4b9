"""Capture-app importers: polycam / metashape / record3d round-trips.

Each test builds a synthetic vendor export with a KNOWN camera-to-world
pose, runs the importer through the real CLI entrypoint, and checks the
written transforms.json reproduces the pose under the documented
convention changes (world-axis cycle, metashape's OpenCV->GL camera flip).
Reference conventions: nerfstudio/process_data/{polycam_utils.py:71-76,
metashape_utils.py:107-114, record3d_utils.py:49-57}.
"""
import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from sdfstudio_tpu.scripts.process_data import entrypoint

RNG = np.random.default_rng(7)


def _random_pose() -> np.ndarray:
    """A proper rigid c2w with a non-trivial rotation."""
    a = RNG.normal(size=(3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    c2w = np.eye(4)
    c2w[:3, :3] = q
    c2w[:3, 3] = RNG.normal(size=3)
    return c2w


def _png(path: Path, w=8, h=6):
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(path)


def test_polycam_roundtrip(tmp_path):
    c2w = _random_pose()
    cams = tmp_path / "cap" / "keyframes" / "corrected_cameras"
    imgs = tmp_path / "cap" / "keyframes" / "corrected_images"
    cams.mkdir(parents=True)
    rec = {"fx": 100.0, "fy": 101.0, "cx": 40.0, "cy": 30.0,
           "width": 80, "height": 60, "blur_score": 99.0}
    for r in range(3):
        for c in range(4):
            rec[f"t_{r}{c}"] = float(c2w[r, c])
    (cams / "0001.json").write_text(json.dumps(rec))
    _png(imgs / "0001.jpg", 80, 60)
    # a blurry frame that must be skipped
    rec_blur = dict(rec, blur_score=1.0)
    (cams / "0002.json").write_text(json.dumps(rec_blur))
    _png(imgs / "0002.jpg", 80, 60)

    out = tmp_path / "out"
    entrypoint(["polycam", "--data", str(tmp_path / "cap"),
                "--output-dir", str(out), "--crop-border-pixels", "2"])

    meta = json.loads((out / "transforms.json").read_text())
    assert len(meta["frames"]) == 1
    f = meta["frames"][0]
    # crop shifts principal point and shrinks the image
    assert f["cx"] == 38.0 and f["w"] == 76
    got = np.asarray(f["transform_matrix"])
    # world-axis cycle (x,y,z)->(z,x,y): row r of output = row CYCLE[r] input
    np.testing.assert_allclose(got[:3], c2w[[2, 0, 1], :], atol=1e-12)
    # rigid transforms stay rigid under the permutation
    np.testing.assert_allclose(got[:3, :3] @ got[:3, :3].T, np.eye(3), atol=1e-9)
    assert (out / "images" / "frame_00000.jpg").exists()


def test_metashape_roundtrip(tmp_path):
    c2w = _random_pose()
    t_flat = " ".join(f"{v:.17g}" for v in c2w.reshape(-1))
    xml = f"""<document>
  <chunk>
    <sensors>
      <sensor id="0">
        <resolution width="80" height="60"/>
        <calibration>
          <f>95.5</f><cx>1.5</cx><cy>-2.0</cy><k1>0.01</k1><p1>0.001</p1>
        </calibration>
      </sensor>
    </sensors>
    <cameras>
      <camera id="0" label="img_a.jpg"><transform>{t_flat}</transform></camera>
      <camera id="1" label="img_missing"><transform>{t_flat}</transform></camera>
      <camera id="2" label="img_b"></camera>
    </cameras>
  </chunk>
</document>"""
    (tmp_path / "doc.xml").write_text(xml)
    imgs = tmp_path / "imgs"
    _png(imgs / "img_a.jpg", 80, 60)
    _png(imgs / "img_b.jpg", 80, 60)

    out = tmp_path / "out"
    entrypoint(["metashape", "--data", str(imgs), "--xml",
                str(tmp_path / "doc.xml"), "--output-dir", str(out)])

    meta = json.loads((out / "transforms.json").read_text())
    # principal point is center + offset; distortion params forwarded
    assert meta["cx"] == 41.5 and meta["cy"] == 28.0
    assert meta["k1"] == 0.01 and meta["p1"] == 0.001 and meta["k2"] == 0.0
    # only the camera with both pose and image survives
    assert len(meta["frames"]) == 1
    got = np.asarray(meta["frames"][0]["transform_matrix"])
    expected = c2w @ np.diag([1.0, -1.0, -1.0, 1.0])  # OpenCV -> GL cam axes
    np.testing.assert_allclose(got[:3], expected[[2, 0, 1], :], atol=1e-12)
    np.testing.assert_allclose(got[:3, :3] @ got[:3, :3].T, np.eye(3), atol=1e-9)


def test_record3d_roundtrip(tmp_path):
    # 5 frames, sampled down to 3
    n = 5
    quats, ts = [], []
    poses = []
    for _ in range(n):
        c2w = _random_pose()
        r = c2w[:3, :3]
        # rotation -> quaternion (w from trace; robust enough for test poses)
        w = np.sqrt(max(0.0, 1 + np.trace(r))) / 2
        x = (r[2, 1] - r[1, 2]) / (4 * w)
        y = (r[0, 2] - r[2, 0]) / (4 * w)
        z = (r[1, 0] - r[0, 1]) / (4 * w)
        poses.append(([x, y, z, w], c2w[:3, 3].tolist(), c2w))
    cap = tmp_path / "cap"
    (cap / "rgbd").mkdir(parents=True)
    for i in range(n):
        _png(cap / "rgbd" / f"{i}.jpg", 16, 12)
    K = np.array([[120.0, 0, 8.0], [0, 120.0, 6.0], [0, 0, 1]])
    md = {
        "poses": [q + t for q, t, _ in poses],
        "K": K.T.reshape(-1).tolist(),  # record3d stores K column-major
        "w": 16,
        "h": 12,
    }
    (cap / "metadata").write_text(json.dumps(md))

    out = tmp_path / "out"
    entrypoint(["record3d", "--data", str(cap), "--output-dir", str(out),
                "--max-dataset-size", "3"])

    meta = json.loads((out / "transforms.json").read_text())
    assert meta["fl_x"] == 120.0 and meta["w"] == 16
    assert meta["cx"] == 8.0 and meta["cy"] == 6.0  # center, not K's cx
    assert len(meta["frames"]) == 3
    # even sampling of 5 -> indices 0, 2, 4
    assert [Path(f["file_path"]).name for f in meta["frames"]] == [
        "0.jpg", "2.jpg", "4.jpg",
    ]
    for f, j in zip(meta["frames"], [0, 2, 4]):
        got = np.asarray(f["transform_matrix"])
        np.testing.assert_allclose(got, poses[j][2], atol=1e-9)


def test_polycam_all_frames_filtered_errors(tmp_path):
    cams = tmp_path / "cap" / "keyframes" / "corrected_cameras"
    cams.mkdir(parents=True)
    rec = {"fx": 1.0, "fy": 1.0, "cx": 1.0, "cy": 1.0, "width": 4,
           "height": 4, "blur_score": 0.1}
    rec.update({f"t_{r}{c}": float(r == c) for r in range(3) for c in range(4)})
    (cams / "0001.json").write_text(json.dumps(rec))
    with pytest.raises(ValueError, match="no usable frames"):
        entrypoint(["polycam", "--data", str(tmp_path / "cap"),
                    "--output-dir", str(tmp_path / "out")])


# ---------------------------------------------------------------------------
# insta360 (reference nerfstudio/process_data/insta360_utils.py:30-105)
# ---------------------------------------------------------------------------


def test_insta360_filename_pairing(tmp_path):
    import pytest

    from sdfstudio_tpu.scripts.process_data import insta360_filenames

    back, front = insta360_filenames(tmp_path / "VID_20220212_070353_00_003.insv")
    assert back.name == "VID_20220212_070353_00_003.insv"
    assert front.name == "VID_20220212_070353_10_003.insv"
    # the front-lens file maps to the same pair
    back2, front2 = insta360_filenames(tmp_path / "VID_20220212_070353_10_003.insv")
    assert (back2.name, front2.name) == (back.name, front.name)
    with pytest.raises(ValueError):
        insta360_filenames(tmp_path / "video.mp4")


def test_insta360_frame_transform():
    import numpy as np

    from sdfstudio_tpu.scripts.process_data import insta360_frame_transform

    frame = np.arange(100 * 200 * 3, dtype=np.uint8).reshape(100, 200, 3)
    out_f = insta360_frame_transform(frame, "front", crop_percentage=0.7)
    out_b = insta360_frame_transform(frame, "back", crop_percentage=0.7)
    # crop 70% then rotate 90deg: (70, 140) -> (140, 70)
    assert out_f.shape == (140, 70, 3) and out_b.shape == (140, 70, 3)
    # front is counter-clockwise, back clockwise: opposite rotations of the
    # SAME crop must be 180deg rotations of each other
    assert np.array_equal(out_f, np.rot90(out_b, k=2))
    # center crop really centers: the central pixel is preserved
    ch = insta360_frame_transform(frame, "front", crop_percentage=0.1)
    assert frame[50, 100, 0] in ch
