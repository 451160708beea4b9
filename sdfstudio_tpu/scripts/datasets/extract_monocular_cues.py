"""Extract monocular depth/normal priors for MonoSDF-style supervision.

Functional spec: reference scripts/datasets/extract_monocular_cues.py —
run a pretrained monocular network on every ``*_rgb.png`` and write the
``*_depth.npy`` / ``*_normal.npy`` (+ preview png) files the sdfstudio
dataparser's mono-prior losses consume. Depth is written in [0,1]
(model output clamp), normals as [3, H, W] in [0,1].

Backends (this environment has zero egress, so model weights can never
be downloaded here; each backend is import/path-gated with a clear
error):

- ``omnidata`` (reference behavior): point --omnidata-path at an
  EPFL-VILAB/omnidata checkout and --pretrained-models at its
  checkpoint dir; the DPT-Hybrid model definition is imported from the
  checkout exactly like the reference (:38-42) so checkpoints load
  unchanged.
- ``transformers``: any local DPT depth checkpoint directory
  (e.g. Intel/dpt-hybrid-midas saved with save_pretrained); depth only.
- ``depth-gradient``: derive normal maps from EXISTING ``*_depth.npy``
  files via the screen-space depth gradient (hermetic: no weights; the
  standard fallback when only a depth prior is available).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def standardize_depth_map(img: np.ndarray, trunc_value: float = 0.1) -> np.ndarray:
    """Zero-mean/unit-var depth with outlier-truncated statistics
    (reference :123-141)."""
    flat = np.sort(img[np.isfinite(img)].ravel())
    lo = int(trunc_value * len(flat))
    hi = int((1 - trunc_value) * len(flat))
    trunc = flat[lo:hi]
    mean, var = float(trunc.mean()), float(trunc.var())
    img = np.nan_to_num(img, nan=mean)
    return (img - mean) / np.sqrt(var + 1e-6)


def normals_from_depth(depth: np.ndarray) -> np.ndarray:
    """[H, W] depth -> [3, H, W] camera-space normals in [0, 1].

    Screen-space gradient normals: n = normalize(-dz/du, -dz/dv, 1),
    mapped from [-1,1] to [0,1] like the omnidata normal convention.
    """
    dzdv, dzdu = np.gradient(depth.astype(np.float64))
    n = np.stack([-dzdu, -dzdv, np.ones_like(depth, dtype=np.float64)])
    n = n / np.maximum(np.linalg.norm(n, axis=0, keepdims=True), 1e-9)
    return ((n + 1.0) * 0.5).astype(np.float32)


def _save_preview(path: Path, arr: np.ndarray) -> None:
    import imageio.v2 as imageio

    from sdfstudio_tpu.utils.colormaps import apply_colormap

    if arr.ndim == 2:  # depth
        rng = float(arr.max() - arr.min()) or 1.0
        rgb = apply_colormap((arr - arr.min()) / rng)
    else:  # [3, H, W] normal in [0,1]
        rgb = np.transpose(arr, (1, 2, 0))
    imageio.imwrite(path, (np.clip(rgb, 0, 1) * 255).astype(np.uint8))


def _iter_rgb(img_path: Path):
    if img_path.is_file():
        yield img_path
    else:
        yield from sorted(img_path.glob("*_rgb.png"))


def run_depth_gradient(img_path: Path, output_path: Path) -> int:
    """Backend ``depth-gradient``: normals from existing *_depth.npy."""
    n = 0
    depths = ([img_path] if img_path.is_file()
              else sorted(img_path.glob("*_depth.npy")))
    for dp in depths:
        depth = np.load(dp)
        normal = normals_from_depth(np.squeeze(depth))
        out = output_path / dp.name.replace("_depth.npy", "_normal.npy")
        np.save(out, normal)
        _save_preview(out.with_suffix(".png"), normal)
        n += 1
    return n


def _load_omnidata_model(task, omnidata_path, pretrained_models, device):
    import torch

    sys.path.insert(0, str(omnidata_path))
    try:
        from modules.midas.dpt_depth import DPTDepthModel
    except ImportError as e:  # pragma: no cover - env-dependent
        raise SystemExit(
            f"--omnidata-path {omnidata_path} does not contain the omnidata "
            "torch modules (expected modules/midas/dpt_depth.py)") from e

    ckpt_name = ("omnidata_dpt_normal_v2.ckpt" if task == "normal"
                 else "omnidata_dpt_depth_v2.ckpt")
    ckpt_path = Path(pretrained_models) / ckpt_name
    if not ckpt_path.exists():
        raise SystemExit(f"checkpoint not found: {ckpt_path}")
    model = DPTDepthModel(backbone="vitb_rn50_384",
                          num_channels=3 if task == "normal" else 1)
    ckpt = torch.load(ckpt_path, map_location="cpu")
    state = ckpt.get("state_dict", ckpt)
    state = {k[6:] if k.startswith("model.") else k: v for k, v in state.items()}
    model.load_state_dict(state)
    return model.to(device).eval()


def run_model(task, img_path, output_path, backend, omnidata_path,
              pretrained_models, model_dir) -> int:
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise SystemExit("model backends require torch") from e
    from PIL import Image

    device = "cuda" if torch.cuda.is_available() else "cpu"
    size = 384

    if backend == "omnidata":
        model = _load_omnidata_model(task, omnidata_path, pretrained_models,
                                     device)
        mean, std = (0.5, 0.5) if task == "depth" else (0.5, 0.5)
    else:  # transformers
        if task != "depth":
            raise SystemExit("the transformers backend only supports depth")
        try:
            from transformers import DPTForDepthEstimation
        except ImportError as e:  # pragma: no cover
            raise SystemExit("transformers not available") from e
        if model_dir is None:
            raise SystemExit("--model-dir (a local DPT checkpoint directory) "
                             "is required for the transformers backend")
        model = DPTForDepthEstimation.from_pretrained(model_dir).to(device).eval()
        mean, std = (0.5, 0.5)

    n = 0
    for path in _iter_rgb(img_path):
        img = Image.open(path).convert("RGB")
        w, h = img.size
        img384 = img.resize((size, size), Image.BILINEAR)
        x = np.asarray(img384, dtype=np.float32) / 255.0
        x = (x - mean) / std
        t = torch.from_numpy(x.transpose(2, 0, 1))[None].to(device)

        with torch.no_grad():
            if backend == "transformers":
                out = model(pixel_values=t).predicted_depth[None]
            else:
                out = model(t)
        out = out.clamp(0, 1).cpu().numpy()[0]  # [H,W] or [3,H,W]

        if task == "depth":
            arr = np.squeeze(out)
            rng = float(arr.max() - arr.min()) or 1.0
            arr = ((arr - arr.min()) / rng).astype(np.float32)
            if (h, w) != arr.shape:
                arr = np.asarray(Image.fromarray(arr).resize((w, h), Image.NEAREST))
        else:
            arr = out.astype(np.float32)
            if arr.shape[1:] != (h, w):
                arr = np.stack([
                    np.asarray(Image.fromarray(c).resize((w, h), Image.NEAREST))
                    for c in arr])

        out_file = output_path / path.name.replace("_rgb.png", f"_{task}.npy")
        np.save(out_file, arr)
        _save_preview(out_file.with_suffix(".png"), arr)
        n += 1
    return n


def entrypoint():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--task", required=True, choices=["depth", "normal"])
    ap.add_argument("--img-path", type=Path, required=True,
                    help="an image file or a directory of *_rgb.png")
    ap.add_argument("--output-path", type=Path, required=True)
    ap.add_argument("--backend", default="omnidata",
                    choices=["omnidata", "transformers", "depth-gradient"])
    ap.add_argument("--omnidata-path", type=Path, default=None,
                    help="EPFL-VILAB/omnidata torch checkout (omnidata backend)")
    ap.add_argument("--pretrained-models", type=Path, default=None,
                    help="omnidata checkpoint dir (omnidata backend)")
    ap.add_argument("--model-dir", type=Path, default=None,
                    help="local DPT checkpoint dir (transformers backend)")
    args = ap.parse_args()

    args.output_path.mkdir(parents=True, exist_ok=True)
    if args.backend == "depth-gradient":
        if args.task != "normal":
            raise SystemExit("depth-gradient derives normals; use --task normal")
        n = run_depth_gradient(args.img_path, args.output_path)
    else:
        if args.backend == "omnidata" and (
                args.omnidata_path is None or args.pretrained_models is None):
            raise SystemExit("--omnidata-path and --pretrained-models are "
                             "required for the omnidata backend")
        n = run_model(args.task, args.img_path, args.output_path,
                      args.backend, args.omnidata_path,
                      args.pretrained_models, args.model_dir)
    print(f"wrote {n} {args.task} priors -> {args.output_path}")


if __name__ == "__main__":
    entrypoint()
