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


@pytest.fixture()
def fake_hloc(tmp_path, monkeypatch):
    """Inject a recording stand-in for the hloc toolbox + pycolmap.

    The fake mirrors hloc's public pipeline surface (extract_features /
    pairs_from_exhaustive / pairs_from_retrieval / match_features /
    reconstruction, each a module with confs + main) so the adapter in
    sdfstudio_tpu/scripts/hloc_sfm.py is exercised end to end; the fake
    reconstruction writes a tiny valid text model like the colmap stub."""
    import types

    calls = []

    def module(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        monkeypatch.setitem(sys.modules, name, m)
        return m

    def write_model(sfm_dir):
        sfm_dir = Path(sfm_dir)
        sfm_dir.mkdir(parents=True, exist_ok=True)
        (sfm_dir / "cameras.txt").write_text(
            "# cameras\n1 PINHOLE 64 48 70.0 70.0 32.0 24.0\n")
        (sfm_dir / "images.txt").write_text(
            "# images\n1 1 0 0 0 0 0 2 1 frame_0.png\n\n"
            "2 1 0 0 0 0 0 2 1 frame_1.png\n\n")
        (sfm_dir / "points3D.txt").write_text("# empty\n")

    extract = module(
        "hloc.extract_features",
        confs={"superpoint_aachen": {"model": "sp"}, "netvlad": {"model": "nv"}},
        main=lambda conf, image_dir, image_list=None, feature_path=None, **kw: (
            calls.append(("extract", conf["model"], list(image_list or []))),
            feature_path,
        )[-1],
    )
    match = module(
        "hloc.match_features",
        confs={"superglue": {"model": "sg"}},
        main=lambda conf, pairs, features=None, matches=None: calls.append(
            ("match", conf["model"])),
    )
    pairs_ex = module(
        "hloc.pairs_from_exhaustive",
        main=lambda pairs, image_list=None: calls.append(
            ("pairs_exhaustive", list(image_list or []))),
    )
    pairs_re = module(
        "hloc.pairs_from_retrieval",
        main=lambda retrieval, pairs, num_matched=0: calls.append(
            ("pairs_retrieval", num_matched)),
    )
    recon = module(
        "hloc.reconstruction",
        main=lambda sfm_dir, image_dir, pairs, features, matches,
        image_list=None, **kw: (calls.append(("reconstruction", dict(kw))),
                                write_model(sfm_dir)),
    )
    module("hloc", extract_features=extract, match_features=match,
           pairs_from_exhaustive=pairs_ex, pairs_from_retrieval=pairs_re,
           reconstruction=recon)
    return calls


def test_images_mode_hloc_backend(tmp_path, fake_hloc):
    src = tmp_path / "capture"
    src.mkdir()
    for i in range(2):
        Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(src / f"frame_{i}.png")
    out = tmp_path / "processed"

    entrypoint(["images", "--data", str(src), "--output-dir", str(out),
                "--sfm-tool", "hloc"])

    # hloc pipeline order (reference process_data/hloc_utils.py:46-119)
    assert [c[0] for c in fake_hloc] == [
        "extract", "pairs_exhaustive", "match", "reconstruction",
    ]
    assert fake_hloc[0][1] == "sp" and fake_hloc[2][1] == "sg"
    assert fake_hloc[0][2] == ["frame_0.png", "frame_1.png"]

    meta = json.loads((out / "transforms.json").read_text())
    assert len(meta["frames"]) == 2 and meta["fl_x"] == 70.0


def test_hloc_requested_but_missing_prints_instructions(tmp_path, capsys):
    src = tmp_path / "capture"
    src.mkdir()
    Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(src / "frame_0.png")
    out = tmp_path / "processed"
    with pytest.raises(SystemExit):
        entrypoint(["images", "--data", str(src), "--output-dir", str(out),
                    "--sfm-tool", "hloc"])
    assert "hloc toolbox is not installed" in capsys.readouterr().err
