"""Resumable heritage-regime benchmark run (the second protocol scene).

Trains `neusW` (NeuralReconW: coarse-grid + surface-cache sampling,
background model, appearance handling) for 20k iterations on the
procedural heritage-like capture (data/synthetic_heritage.py) and logs
PSNR + Chamfer-L1 to `.parity/heritage_metrics.json` — the unbounded +
masks + appearance regime the DTU-like protocol cannot exercise
(reference heritage_dataparser.py:72-372, 8-GPU heritage runs in
method_configs.py:102,510).

Same segmented/resumable structure as parity.py (fresh subprocess per
segment; invoke again to resume), so rounds can contribute slices.

Usage:
    python -m sdfstudio_tpu.scripts.benchmarking.heritage_bench \
        [--budget-seconds 3600] [--iters 20000] [--method neusW]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[3]
PARITY_DIR = Path(os.environ.get("SST_PARITY_DIR", REPO / ".parity"))
DATA_DIR = PARITY_DIR / "heritage_like"
RUNS_DIR = PARITY_DIR / "runs"
NUM_RAYS = int(os.environ.get("SST_PARITY_RAYS", 2048))


def ensure_scene() -> Path:
    if not (DATA_DIR / "sparse" / "points3D.txt").exists():
        print("[heritage] materializing heritage-like scene...", flush=True)
        from sdfstudio_tpu.data.synthetic_heritage import generate_heritage_like_dataset

        n, res = (int(x) for x in os.environ.get("SST_HERITAGE_SCENE", "36,384").split(","))
        generate_heritage_like_dataset(DATA_DIR, num_images=n, width=res, height=res)
    return DATA_DIR


def base_dir(method: str) -> Path:
    return RUNS_DIR / "heritage" / method / "parity"


def ckpt_dir(method: str) -> Path:
    return base_dir(method) / "sdfstudio_models"


def latest_step(method: str) -> int:
    steps = [
        int(p.name.split("-")[1])
        for p in ckpt_dir(method).glob("step-*")
        if (p / "step.txt").exists()
    ]
    return max(steps, default=0)


def train_segment(method: str, end: int, resume: bool) -> None:
    args = [
        sys.executable, "-m", "sdfstudio_tpu.scripts.train", method,
        "--experiment-name", "heritage",
        "--output-dir", str(RUNS_DIR),
        "--timestamp", "parity",
        "--vis", "none",
        "--trainer.max-num-iterations", str(end),
        "--trainer.defer-heavy-ops", "True",
        "--trainer.steps-per-eval-image", "0",
        "--datamanager.train-num-rays-per-batch", str(NUM_RAYS),
    ]
    if resume:
        args += [
            "--trainer.load-dir", str(ckpt_dir(method)),
            "--trainer.load-step", str(latest_step(method)),
        ]
    args += ["heritage-data", "--data", str(DATA_DIR)]
    env = dict(os.environ, SST_SEGMENT_CHILD="1")
    t0 = time.time()
    from sdfstudio_tpu.scripts.benchmarking.parity import run_with_stall_guard

    ret = run_with_stall_guard(args, env)
    if ret == -9:
        return  # stalled segment: caller's while-loop resumes from checkpoint
    if ret != 0:
        raise RuntimeError(f"[heritage] segment for {method} failed (rc={ret})")
    print(f"[heritage] {method}: segment -> {end} done in {time.time() - t0:.0f}s",
          flush=True)


def evaluate(method: str) -> dict:
    base = base_dir(method)
    out = base / "heritage_metrics.json"
    if out.exists():
        cached = json.loads(out.read_text())
        if cached.get("iters") == latest_step(method):
            return cached
        out.unlink()
    psnr_json = base / "eval_metrics.json"
    subprocess.run(
        [sys.executable, "-m", "sdfstudio_tpu.scripts.eval",
         "--load-config", str(base / "config.yml"),
         "--output-path", str(psnr_json)],
        check=True, cwd=REPO,
    )
    psnr = json.loads(psnr_json.read_text())["results"]
    geo = subprocess.run(
        [sys.executable, "-m", "sdfstudio_tpu.scripts.benchmarking.eval_geometry",
         "--load-dir", str(ckpt_dir(method)),
         "--method", method,
         "--data", str(DATA_DIR),
         "--gt", "heritage-like",
         "--output-mesh", str(base / "mesh.ply")],
        check=True, cwd=REPO, capture_output=True, text=True,
    )
    m = re.search(r"chamfer_l1=([0-9.]+)", geo.stdout)
    if m is None:
        print(geo.stdout[-2000:], geo.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"[heritage] geometry eval for {method} produced no chamfer")
    rec = {
        "method": method,
        "scene": "heritage_like",
        "iters": latest_step(method),
        "psnr": psnr["psnr"],
        "ssim": psnr.get("ssim"),
        "chamfer_l1": float(m.group(1)),
    }
    out.write_text(json.dumps(rec, indent=2))
    (PARITY_DIR / "heritage_metrics.json").write_text(json.dumps(rec, indent=2))
    print(f"[heritage] {method}: {rec}", flush=True)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--method", default="neusW")
    ap.add_argument("--segment", type=int, default=2500)
    ap.add_argument("--budget-seconds", type=float, default=None)
    ap.add_argument("--iters", type=int, default=20000)
    args = ap.parse_args()
    t_start = time.time()
    ensure_scene()
    while (start := latest_step(args.method)) < args.iters:
        if args.budget_seconds and time.time() - t_start > args.budget_seconds:
            print(f"[heritage] budget exhausted at step {start}; re-run to resume",
                  flush=True)
            return
        train_segment(args.method, min(start + args.segment, args.iters),
                      resume=start > 0)
    evaluate(args.method)


if __name__ == "__main__":
    main()
