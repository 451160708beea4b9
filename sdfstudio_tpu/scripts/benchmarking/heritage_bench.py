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


def train_segment(method: str, end: int, resume: bool,
                  final_eval: bool = False) -> None:
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
    if final_eval:
        # in-process protocol eval (engine/final_eval.py) — same relay
        # rationale as parity.py's final segment
        base = base_dir(method)
        args += [
            "--trainer.final-eval-gt", "heritage-like",
            "--trainer.final-eval-output", str(base / "heritage_metrics.json"),
            "--trainer.final-eval-mesh", str(base / "mesh.ply"),
            "--trainer.final-eval-resolution",
            os.environ.get("SST_PARITY_GEO_RES", "256"),
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
    """Metrics come from the trainer's in-process final eval — written by
    the last training segment, or by a zero-step eval segment here for a
    checkpoint trained before the final-eval path existed."""
    base = base_dir(method)
    out = base / "heritage_metrics.json"
    if out.exists():
        cached = json.loads(out.read_text())
        if cached.get("iters") == latest_step(method) and cached.get("chamfer_l1") is not None:
            (PARITY_DIR / "heritage_metrics.json").write_text(json.dumps(cached, indent=2))
            return cached
        out.unlink()
    train_segment(method, latest_step(method), resume=True, final_eval=True)
    if not out.exists():
        raise RuntimeError(f"[heritage] eval segment for {method} wrote no metrics")
    rec = json.loads(out.read_text())
    rec["scene"] = "heritage_like"
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
        end = min(start + args.segment, args.iters)
        train_segment(args.method, end, resume=start > 0,
                      final_eval=end >= args.iters)
    evaluate(args.method)


if __name__ == "__main__":
    main()
