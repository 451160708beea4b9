"""Viewer camera-path workflow: keyframes -> saved JSON -> sst-render cameras.

Covers the reference's viewer camera-path editor + render-command export
(reference nerfstudio/viewer/server/viewer_utils.py:208+, scripts/render.py
--traj filename)."""
import json

import numpy as np
import pytest

from sdfstudio_tpu.cameras.camera_paths import get_path_from_json
from sdfstudio_tpu.viewer.server import save_camera_path


@pytest.fixture()
def keyframes():
    return [
        {"azimuth": 0.0, "elevation": 0.3, "radius": 2.5},
        {"azimuth": 1.2, "elevation": 0.5, "radius": 2.0},
        {"azimuth": 2.5, "elevation": 0.2, "radius": 2.8},
    ]


def test_save_camera_path_roundtrip(keyframes, tmp_path):
    out, cmd = save_camera_path(
        keyframes, fps=10, seconds=2, render_width=64, render_height=64,
        base_dir=tmp_path,
    )
    assert out.exists()
    data = json.loads(out.read_text())
    assert len(data["camera_path"]) == 20
    assert data["render_width"] == 64

    # the exported command references the written file and the config
    assert str(out) in cmd and "config.yml" in cmd and "--traj filename" in cmd

    # loads into renderable Cameras via the sst-render path
    cams = get_path_from_json(data)
    assert cams.num_cameras == 20
    bundle = cams.generate_image_rays(0)
    assert bundle.origins.shape == (64 * 64, 3)
    # orbit cameras look at the origin: ray through the image center passes
    # near (0,0,0)
    c = bundle.origins.shape[0] // 2 + 32  # center pixel
    o, d = np.asarray(bundle.origins[c]), np.asarray(bundle.directions[c])
    closest = o - d * np.dot(o, d) / np.dot(d, d)
    assert np.linalg.norm(closest) < 0.1


def test_path_interpolates_through_keyframes(keyframes, tmp_path):
    out, _ = save_camera_path(
        keyframes, fps=10, seconds=2, render_width=32, render_height=32,
        base_dir=tmp_path,
    )
    data = json.loads(out.read_text())
    first = np.asarray(data["camera_path"][0]["camera_to_world"]).reshape(4, 4)
    last = np.asarray(data["camera_path"][-1]["camera_to_world"]).reshape(4, 4)

    def orbit_center(kf):
        r, az, el = kf["radius"], kf["azimuth"], kf["elevation"]
        return np.array(
            [r * np.cos(az) * np.cos(el), r * np.sin(az) * np.cos(el), r * np.sin(el)]
        )

    # endpoints hit the first/last keyframes exactly
    np.testing.assert_allclose(first[:3, 3], orbit_center(keyframes[0]), atol=1e-6)
    np.testing.assert_allclose(last[:3, 3], orbit_center(keyframes[-1]), atol=1e-6)


def test_viewer_control_and_export_endpoints(tmp_path):
    """Pause/resume + export-panel endpoints through a live HTTP server."""
    import threading
    import urllib.request

    from http.server import ThreadingHTTPServer

    from sdfstudio_tpu.viewer.server import ViewerState, _make_handler

    class FakeTrainer:
        base_dir = tmp_path

    state = ViewerState(FakeTrainer())
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=json.dumps(payload).encode()
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            return json.loads(r.read())

    try:
        assert post("/control", {"action": "pause"}) == {"paused": True}
        assert state.paused
        assert post("/control", {"action": "toggle"}) == {"paused": False}

        cmd = post("/export_cmd", {"kind": "poisson", "resolution": 128})["command"]
        assert "sst-export poisson" in cmd and "--resolution 128" in cmd
        assert str(tmp_path / "config.yml") in cmd

        tex = post("/export_cmd", {"kind": "texture", "resolution": 64})["command"]
        assert "sst-texture" in tex and "--input-mesh" in tex
        assert "sst-export marching-cubes" in tex  # mesh produced first

        pc = post("/export_cmd", {"kind": "pointcloud"})["command"]
        assert "--num-points" in pc

        # crop box -> exporter bounding-box flags (reference ExportModal)
        cropped = post("/export_cmd", {
            "kind": "marching-cubes", "resolution": 64,
            "crop": {"min": [-0.5, -0.5, 0.0], "max": [0.5, 0.5, 1.0]},
        })["command"]
        assert "--bounding-box-min -0.5 -0.5 0" in cropped
        assert "--bounding-box-max 0.5 0.5 1" in cropped
    finally:
        server.shutdown()


def test_viewer_service_blocks_while_paused(tmp_path):
    """service() must not return to the train loop while paused."""
    import threading
    import time

    from sdfstudio_tpu.viewer.server import ViewerState

    class FakeTrainer:
        base_dir = tmp_path

    state = ViewerState(FakeTrainer())
    state.paused = True
    returned = threading.Event()

    def run():
        state.service()
        returned.set()

    threading.Thread(target=run, daemon=True).start()
    time.sleep(0.3)
    assert not returned.is_set()  # still paused -> still blocked
    state.paused = False
    assert returned.wait(timeout=5.0)


def test_save_camera_path_pose_keyframes(tmp_path):
    """Free 6-DoF keyframes: slerp orientations + Catmull-Rom positions
    (reference viewer app camera-path editor; VERDICT r2 item 7)."""
    from sdfstudio_tpu.cameras.camera_utils import (
        quaternion_from_matrix,
        viewmatrix,
    )

    def pose_kf(eye, lookat):
        c2w = np.eye(4)
        c2w[:3] = viewmatrix(np.asarray(lookat) - np.asarray(eye),
                             np.array([0.0, 0.0, 1.0]), np.asarray(eye))
        return {
            "position": list(map(float, eye)),
            "quaternion_wxyz": quaternion_from_matrix(c2w).tolist(),
        }, c2w

    kf0, c2w0 = pose_kf([2.0, 0.0, 1.0], [0, 0, 0])
    kf1, c2w1 = pose_kf([0.0, 2.5, 0.5], [0.2, 0, 0])
    kf2, c2w2 = pose_kf([-2.0, 0.5, 1.5], [0, 0.1, 0])

    out, cmd = save_camera_path(
        [kf0, kf1, kf2], fps=10, seconds=2, render_width=32, render_height=32,
        base_dir=tmp_path,
    )
    data = json.loads(out.read_text())
    assert len(data["camera_path"]) == 20
    first = np.asarray(data["camera_path"][0]["camera_to_world"]).reshape(4, 4)
    last = np.asarray(data["camera_path"][-1]["camera_to_world"]).reshape(4, 4)
    # endpoints reproduce the keyframe poses exactly (position AND rotation)
    np.testing.assert_allclose(first, c2w0, atol=1e-9)
    np.testing.assert_allclose(last, c2w2, atol=1e-9)
    # every interpolated rotation stays orthonormal (valid slerp output)
    for cam in data["camera_path"]:
        r = np.asarray(cam["camera_to_world"]).reshape(4, 4)[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
    # loads into renderable Cameras through the sst-render path
    cams = get_path_from_json(data)
    assert cams.num_cameras == 20


def test_scene_endpoint_serves_train_cameras(tmp_path):
    """/scene returns dataset camera frusta (init_scene analog,
    reference viewer_utils.py:300-420)."""
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from sdfstudio_tpu.cameras.cameras import Cameras
    from sdfstudio_tpu.viewer.server import ViewerState, _make_handler

    poses = np.tile(np.eye(4)[:3], (3, 1, 1)).astype(np.float32)
    poses[:, 2, 3] = [1.0, 2.0, 3.0]
    cams = Cameras.create(
        camera_to_worlds=poses, fx=50.0, fy=50.0, cx=32.0, cy=24.0,
        width=64, height=48,
    )

    from sdfstudio_tpu.core.scene_box import SceneBox

    class FakeDM:
        train_cameras = cams

    class FakeModel:
        scene_box = SceneBox()

    class FakeTrainer:
        base_dir = tmp_path
        datamanager = FakeDM()
        model = FakeModel()

    state = ViewerState(FakeTrainer())
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/scene", timeout=10) as r:
            data = json.loads(r.read())
        assert len(data["cameras"]) == 3
        assert data["cameras"][0]["fx"] == 50.0
        assert data["cameras"][0]["w"] == 64
        c2w = np.asarray(data["cameras"][1]["c2w"]).reshape(-1, 4)
        assert c2w[2, 3] == 2.0
        # scene box shipped for the crop-box prefill
        assert np.asarray(data["aabb"]).shape == (2, 3)
    finally:
        server.shutdown()
