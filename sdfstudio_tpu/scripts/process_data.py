"""sst-process-data: capture -> nerfstudio/sdfstudio format.

Functional spec: reference scripts/process_data.py:733 (images/video ->
ffmpeg frames -> COLMAP/hloc SfM -> transforms.json). End-to-end behavior
depends on what the machine provides:

* when a ``colmap`` binary is on PATH, SfM is orchestrated in-process with
  the reference's command sequence (feature_extractor -> matcher -> mapper
  -> bundle_adjuster; reference process_data/colmap_utils.py run_colmap);
* when a COLMAP sparse model already exists (data/colmap/sparse/0 or
  data/sparse/0), transforms.json is written from it using the built-in
  pure-python COLMAP readers (bin and txt);
* ``video`` mode extracts frames with imageio/pyav when available
  (ffmpeg's role in the reference); ``insta360`` mode pairs the dual-lens
  .insv videos, center-crops the fisheye border and counter-rotates the
  lenses before the joint SfM (reference process_data/insta360_utils.py);
* capture-app modes (``polycam`` / ``metashape`` / ``record3d``) convert
  app-exported poses directly — no SfM (sdfstudio_tpu/scripts/importers.py);
* otherwise the tool prints the exact external commands to run
  (hermetic environments without COLMAP).

The reference's optional hloc backend (learned features; an alternative to
COLMAP's SIFT) is supported via ``--sfm-tool hloc``
(sdfstudio_tpu/scripts/hloc_sfm.py, reference process_data/hloc_utils.py):
import-gated, since hloc pulls torch-GPU + model weights a zero-egress
deployment cannot fetch; without the toolbox the tool prints what to run.

Converters to sdfstudio format live in sdfstudio_tpu/scripts/datasets/.
"""
from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np

from sdfstudio_tpu.scripts import hloc_sfm


def run_colmap(
    out_dir: Path,
    image_dir: Path,
    camera_model: str = "OPENCV",
    matcher: str = "exhaustive",
    use_gpu: bool = False,
    colmap_cmd: str = "colmap",
    verbose: bool = False,
) -> Path:
    """Run the COLMAP SfM pipeline (the reference's run_colmap,
    process_data/colmap_utils.py: feature_extractor -> *_matcher -> mapper
    -> bundle_adjuster). Returns the sparse model dir (sparse/0)."""
    db = out_dir / "database.db"
    sparse = out_dir / "sparse"
    sparse.mkdir(parents=True, exist_ok=True)
    gpu = "1" if use_gpu else "0"

    def run(args):
        if verbose:
            print("[colmap]", " ".join(str(a) for a in args), flush=True)
        subprocess.run(
            [str(a) for a in args],
            check=True,
            capture_output=not verbose,
        )

    run([
        colmap_cmd, "feature_extractor",
        "--database_path", db,
        "--image_path", image_dir,
        "--ImageReader.single_camera", "1",
        "--ImageReader.camera_model", camera_model,
        "--SiftExtraction.use_gpu", gpu,
    ])
    run([
        colmap_cmd, f"{matcher}_matcher",
        "--database_path", db,
        "--SiftMatching.use_gpu", gpu,
    ])
    run([
        colmap_cmd, "mapper",
        "--database_path", db,
        "--image_path", image_dir,
        "--output_path", sparse,
    ])
    model = sparse / "0"
    run([
        colmap_cmd, "bundle_adjuster",
        "--input_path", model,
        "--output_path", model,
        "--BundleAdjustment.refine_principal_point", "1",
    ])
    return model


def colmap_to_transforms(data_dir: Path, out_path: Path, images_path: str = "images"):
    """Write nerfstudio transforms.json from an existing COLMAP sparse model
    (the reference's colmap_utils.colmap_to_json equivalent)."""
    from sdfstudio_tpu.data.utils import colmap_utils

    for cand in [data_dir / "colmap" / "sparse" / "0", data_dir / "sparse" / "0", data_dir / "sparse"]:
        if cand.exists():
            sparse = cand
            break
    else:
        raise FileNotFoundError(f"no COLMAP sparse model under {data_dir}")
    cams, imgs, _ = colmap_utils.read_model(sparse)

    frames = []
    shared = None
    for img in sorted(imgs.values(), key=lambda im: im.name):
        cam = cams[img.camera_id]
        R = img.qvec2rotmat()
        t = img.tvec.reshape(3, 1)
        w2c = np.concatenate([np.concatenate([R, t], 1), np.array([[0, 0, 0, 1.0]])], 0)
        c2w = np.linalg.inv(w2c)
        c2w[0:3, 1:3] *= -1  # OpenCV -> nerfstudio (OpenGL) convention
        if cam.model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL"):
            fl_x = fl_y = cam.params[0]
            cx, cy = cam.params[1], cam.params[2]
        else:
            fl_x, fl_y = cam.params[0], cam.params[1]
            cx, cy = cam.params[2], cam.params[3]
        shared = {
            "fl_x": float(fl_x),
            "fl_y": float(fl_y),
            "cx": float(cx),
            "cy": float(cy),
            "w": int(cam.width),
            "h": int(cam.height),
            "camera_model": "OPENCV",
        }
        frames.append(
            {
                "file_path": f"{images_path}/{img.name}",
                "transform_matrix": c2w.tolist(),
            }
        )
    meta = {**(shared or {}), "frames": frames}
    out_path.write_text(json.dumps(meta, indent=1))
    print(f"wrote {out_path} with {len(frames)} frames")


def extract_video_frames(video: Path, out_dir: Path, num_frames: int = 300):
    import imageio.v2 as imageio

    out_dir.mkdir(parents=True, exist_ok=True)
    reader = imageio.get_reader(video)
    total = reader.count_frames()
    idx = np.linspace(0, total - 1, min(num_frames, total)).astype(int)
    wanted = set(idx.tolist())
    k = 0
    for i, frame in enumerate(reader):
        if i in wanted:
            imageio.imwrite(out_dir / f"frame_{k:05d}.png", frame)
            k += 1
    print(f"extracted {k} frames to {out_dir}")


def insta360_filenames(data: Path) -> tuple[Path, Path]:
    """Back/front lens video pair from one .insv filename
    (reference insta360_utils.py:30-51: VID_<date>_<time>_00_<seq>.insv is
    the back lens, _10_ the front)."""
    if data.suffix != ".insv":
        raise ValueError("The input file must be an .insv file.")
    parts = data.stem.split("_")
    back = data.parent / f"VID_{parts[1]}_{parts[2]}_00_{parts[4]}.insv"
    front = data.parent / f"VID_{parts[1]}_{parts[2]}_10_{parts[4]}.insv"
    return back, front


def insta360_frame_transform(frame: np.ndarray, lens: str,
                             crop_percentage: float = 0.7) -> np.ndarray:
    """Per-lens fisheye frame prep (reference insta360_utils.py:99-105):
    center-crop to crop_percentage (trims the curved fisheye border), then
    rotate 90deg — counter-clockwise for the front lens (ffmpeg
    transpose=2), clockwise for the back (transpose=1)."""
    h, w = frame.shape[:2]
    ch, cw = int(h * crop_percentage), int(w * crop_percentage)
    y0, x0 = (h - ch) // 2, (w - cw) // 2
    cropped = frame[y0 : y0 + ch, x0 : x0 + cw]
    k = 1 if lens == "front" else -1  # np.rot90 k=1 is counter-clockwise
    return np.rot90(cropped, k=k)


def extract_insta360_frames(
    video: Path, out_dir: Path, num_frames: int = 300, crop_percentage: float = 0.7
):
    """Extract + prep frames from an insta360 dual-lens capture; both
    lenses' frames land in out_dir for one joint SfM reconstruction."""
    import imageio.v2 as imageio

    back, front = insta360_filenames(Path(video))
    out_dir.mkdir(parents=True, exist_ok=True)
    k = 0
    for lens, path in (("front", front), ("back", back)):
        if not path.exists():
            print(f"[insta360] missing {lens} lens video {path}; skipping")
            continue
        reader = imageio.get_reader(path)
        total = reader.count_frames()
        idx = np.linspace(0, total - 1, min(num_frames // 2, total)).astype(int)
        wanted = set(idx.tolist())
        for i, frame in enumerate(reader):
            if i in wanted:
                prepped = insta360_frame_transform(frame, lens, crop_percentage)
                imageio.imwrite(out_dir / f"frame_{k:05d}.png", prepped)
                k += 1
    print(f"extracted {k} insta360 frames to {out_dir}")


def entrypoint(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pi = sub.add_parser("images")
    pv = sub.add_parser("video")
    pv.add_argument("--num-frames-target", type=int, default=300)
    p360 = sub.add_parser("insta360")
    p360.add_argument("--num-frames-target", type=int, default=300)
    p360.add_argument("--crop-percentage", type=float, default=0.7)
    for sp in (pi, pv, p360):
        sp.add_argument("--data", type=Path, required=True)
        sp.add_argument("--output-dir", type=Path, required=True)
        sp.add_argument("--matching-method", default="exhaustive",
                        choices=["exhaustive", "sequential", "vocab_tree"])
        sp.add_argument("--camera-type", default="OPENCV")
        sp.add_argument("--sfm-tool", default="colmap",
                        choices=["colmap", "hloc"],
                        help="SfM backend (reference scripts/process_data.py "
                             "--sfm-tool); hloc needs the hloc toolbox installed")
        sp.add_argument("--feature-type", default="superpoint_aachen",
                        choices=list(hloc_sfm.FEATURE_TYPES),
                        help="hloc local feature (ignored for colmap)")
        sp.add_argument("--matcher-type", default="superglue",
                        choices=list(hloc_sfm.MATCHER_TYPES),
                        help="hloc matcher (ignored for colmap)")
        sp.add_argument("--num-matched", type=int, default=50,
                        help="hloc retrieval neighbours per image")
        sp.add_argument("--no-sfm", action="store_true",
                        help="skip SfM even if the backend is available")
        sp.add_argument("--use-gpu", action="store_true")
        sp.add_argument("--verbose", action="store_true")
    # capture-app importers (no SfM needed — poses come from the app);
    # reference scripts/process_data.py:733 polycam/metashape/record3d modes
    pp = sub.add_parser("polycam")
    pp.add_argument("--data", type=Path, required=True,
                    help="unzipped polycam export (contains keyframes/)")
    pp.add_argument("--output-dir", type=Path, required=True)
    pp.add_argument("--min-blur-score", type=float, default=25.0)
    pp.add_argument("--crop-border-pixels", type=int, default=15)
    pp.add_argument("--use-uncorrected-images", action="store_true")
    pm = sub.add_parser("metashape")
    pm.add_argument("--data", type=Path, required=True, help="image directory")
    pm.add_argument("--xml", type=Path, required=True,
                    help="metashape camera export (doc.xml)")
    pm.add_argument("--output-dir", type=Path, required=True)
    pr = sub.add_parser("record3d")
    pr.add_argument("--data", type=Path, required=True,
                    help="record3d capture dir (metadata + rgbd/)")
    pr.add_argument("--output-dir", type=Path, required=True)
    pr.add_argument("--max-dataset-size", type=int, default=300)
    a = p.parse_args(argv)

    if a.cmd in ("polycam", "metashape", "record3d"):
        from sdfstudio_tpu.scripts import importers

        if a.cmd == "polycam":
            importers.polycam_to_transforms(
                a.data, a.output_dir,
                min_blur_score=a.min_blur_score,
                crop_border_pixels=a.crop_border_pixels,
                use_uncorrected_images=a.use_uncorrected_images,
            )
        elif a.cmd == "metashape":
            importers.metashape_to_transforms(a.xml, a.data, a.output_dir)
        else:
            importers.record3d_to_transforms(
                a.data, a.output_dir, max_dataset_size=a.max_dataset_size
            )
        return

    out = Path(a.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    if a.cmd == "insta360":
        extract_insta360_frames(
            Path(a.data), out / "images", a.num_frames_target, a.crop_percentage
        )
    elif a.cmd == "video":
        extract_video_frames(Path(a.data), out / "images", a.num_frames_target)
    else:
        imgs = out / "images"
        if Path(a.data).resolve() != imgs.resolve():
            imgs.mkdir(parents=True, exist_ok=True)
            for f in sorted(Path(a.data).iterdir()):
                if f.suffix.lower() in (".jpg", ".jpeg", ".png"):
                    shutil.copy(f, imgs / f.name)

    # orchestrate SfM when a backend is available and no sparse model
    # exists yet (reference process_data.py:733 runs COLMAP/hloc itself)
    has_model = any(
        (out / c).exists() for c in ("colmap/sparse/0", "sparse/0", "sparse")
    )
    if not has_model and not a.no_sfm:
        if a.sfm_tool == "hloc" and hloc_sfm.hloc_available():
            print("running hloc SfM", flush=True)
            hloc_sfm.run_hloc(
                out / "images",
                out,
                camera_model=a.camera_type,
                matching_method=a.matching_method,
                feature_type=a.feature_type,
                matcher_type=a.matcher_type,
                num_matched=a.num_matched,
                verbose=a.verbose,
            )
        elif a.sfm_tool == "hloc":
            print(
                "--sfm-tool hloc requested but the hloc toolbox is not "
                "installed (https://github.com/cvg/Hierarchical-Localization); "
                "falling back to the external-command instructions below.",
                file=sys.stderr,
            )
        elif colmap_bin := shutil.which("colmap"):
            print(f"running COLMAP SfM ({colmap_bin})", flush=True)
            run_colmap(
                out,
                out / "images",
                camera_model=a.camera_type,
                matcher=a.matching_method,
                use_gpu=a.use_gpu,
                verbose=a.verbose,
            )

    try:
        colmap_to_transforms(out, out / "transforms.json")
    except FileNotFoundError:
        print(
            "No COLMAP sparse model found and no colmap binary on PATH.\n"
            "Run SfM externally, e.g.:\n"
            f"  colmap automatic_reconstructor --workspace_path {out} "
            f"--image_path {out / 'images'} --sparse 1 --dense 0\n"
            "then re-run this command to produce transforms.json.",
            file=sys.stderr,
        )
        sys.exit(2)


if __name__ == "__main__":
    entrypoint()
