"""sst-process-data: COLMAP orchestration + transforms.json conversion.

Covers reference scripts/process_data.py:733 behavior: when a colmap
binary is available the tool runs the full SfM sequence itself; the test
substitutes a recording stub that writes a tiny valid text model, then
checks the orchestrated command order and the resulting transforms.json.
"""
import json
import os
import stat
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from sdfstudio_tpu.scripts.process_data import entrypoint

STUB = """#!{python}
import sys, json
from pathlib import Path
log = Path({log!r})
with log.open("a") as f:
    f.write(json.dumps(sys.argv[1:]) + "\\n")
if sys.argv[1] == "mapper":
    out = Path(sys.argv[sys.argv.index("--output_path") + 1]) / "0"
    out.mkdir(parents=True, exist_ok=True)
    (out / "cameras.txt").write_text(
        "# cameras\\n1 PINHOLE 64 48 70.0 70.0 32.0 24.0\\n")
    # qvec = identity, tvec = (0, 0, 2): camera 2 units down +z
    (out / "images.txt").write_text(
        "# images\\n1 1 0 0 0 0 0 2 1 frame_0.png\\n\\n"
        "2 1 0 0 0 0 0 2 1 frame_1.png\\n\\n")
    (out / "points3D.txt").write_text("# empty\\n")
"""


@pytest.fixture()
def fake_colmap(tmp_path, monkeypatch):
    log = tmp_path / "colmap_calls.jsonl"
    binary = tmp_path / "bin" / "colmap"
    binary.parent.mkdir()
    binary.write_text(STUB.format(python=sys.executable, log=str(log)))
    binary.chmod(binary.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{binary.parent}{os.pathsep}{os.environ['PATH']}")
    return log


def test_images_mode_orchestrates_colmap(tmp_path, fake_colmap):
    src = tmp_path / "capture"
    src.mkdir()
    for i in range(2):
        Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(src / f"frame_{i}.png")
    out = tmp_path / "processed"

    entrypoint(["images", "--data", str(src), "--output-dir", str(out)])

    calls = [json.loads(l) for l in fake_colmap.read_text().splitlines()]
    # the reference pipeline order (process_data/colmap_utils.py run_colmap)
    assert [c[0] for c in calls] == [
        "feature_extractor", "exhaustive_matcher", "mapper", "bundle_adjuster",
    ]
    assert "--ImageReader.camera_model" in calls[0]
    assert calls[0][calls[0].index("--ImageReader.camera_model") + 1] == "OPENCV"

    meta = json.loads((out / "transforms.json").read_text())
    assert len(meta["frames"]) == 2
    assert meta["fl_x"] == 70.0 and meta["w"] == 64
    # w2c has tvec (0,0,2) with identity R -> camera center at (0,0,-2)
    c2w = np.asarray(meta["frames"][0]["transform_matrix"])
    np.testing.assert_allclose(c2w[:3, 3], [0, 0, -2], atol=1e-6)


def test_images_mode_skips_sfm_when_model_exists(tmp_path, fake_colmap):
    src = tmp_path / "capture"
    src.mkdir()
    Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(src / "frame_0.png")
    out = tmp_path / "processed"
    model = out / "sparse" / "0"
    model.mkdir(parents=True)
    (model / "cameras.txt").write_text("# c\n1 PINHOLE 64 48 70.0 70.0 32.0 24.0\n")
    (model / "images.txt").write_text("# i\n1 1 0 0 0 0 0 2 1 frame_0.png\n\n")
    (model / "points3D.txt").write_text("#\n")

    entrypoint(["images", "--data", str(src), "--output-dir", str(out)])

    assert not fake_colmap.exists()  # no colmap invocation
    assert (out / "transforms.json").exists()


def test_images_mode_errors_without_colmap(tmp_path):
    src = tmp_path / "capture"
    src.mkdir()
    Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(src / "frame_0.png")
    out = tmp_path / "processed"
    with pytest.raises(SystemExit):
        entrypoint(["images", "--data", str(src), "--output-dir", str(out), "--no-sfm"])
