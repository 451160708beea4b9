"""Preset-candidate shootout: decide the next neus-facto-tpu layout.

The gather-strategy sweep (docs/tpu-design.md, probe_gather2) pinned the
hash-table row-gather at ~161M rows/s and showed the rate is independent
of row WIDTH up to F=4 — so the remaining throughput levers are
access-count-structural. This tool trains each candidate layout for a
short budget (default 2k iterations — the reference's own "reasonable
reconstruction after 2K iterations" checkpoint, README.md:83) on the
DTU-like protocol scene and reports WALL-CLOCK rays/s + PSNR + Chamfer-L1
side by side, so the preset upgrade is an evidence-based pick. The winner
still must pass the FULL 20k-iteration parity protocol before bench.py
may measure it (docs/parity-protocol.md).

Candidates (over the committed neus-facto-tpu base):
  base      L8xF2 hash, 2^19, max_res 512 (as committed)
  l4xf4     4 levels x 4 features — HALF the gather rows, same feature width
  l2xf8     2 levels x 8 features — quarter rows at 0.9x row rate
  permuto   permutohedral lattice — 4 simplex corners per lookup vs 8
  rays4096  2x batch (amortizes the ~70 ms non-gather floor; rays/s metric)
  neusacc   occupancy-grid sampling (neus-acc) — the structural alternative
            to proposal distillation; compared after training because grid
            pruning is what removes its padding waste

Usage (TPU):
    python -m sdfstudio_tpu.scripts.benchmarking.preset_candidates \
        [--iters 2000] [--only base,l4xf4] [--budget-seconds 3600]
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
DATA_DIR = PARITY_DIR / "dtu_like"
RUNS_DIR = PARITY_DIR / "candidate_runs"
OUT_JSON = PARITY_DIR / "preset_candidates.json"

# name -> (method, extra CLI overrides). "neusacc" measures the occupancy-
# grid sampling path (nerfacc's replacement) as a structural alternative to
# proposal distillation — its padding waste shrinks as training prunes the
# grid, which is why candidates are compared AFTER short training, not at
# step 0.
CANDIDATES: dict[str, tuple[str, list[str]]] = {
    "base": ("neus-facto-tpu", []),
    "l4xf4": ("neus-facto-tpu", ["--model.sdf-field.num-levels", "4",
              "--model.sdf-field.hash-features-per-level", "4"]),
    "l2xf8": ("neus-facto-tpu", ["--model.sdf-field.num-levels", "2",
              "--model.sdf-field.hash-features-per-level", "8"]),
    "permuto": ("neus-facto-tpu", ["--model.sdf-field.encoding-type", "permuto"]),
    "permuto_l4xf4": ("neus-facto-tpu", [
        # the feasibility memo's best structural point (docs/tpu-design.md
        # "90k feasibility"): 4 simplex corners x 4 levels x F4 = 16
        # gather rows/query vs the committed preset's 64.
        # max-res pinned to 512: the round-4 600-step checkpoint was
        # trained before the (since data-refuted) max_res-2048 change, and
        # the 20k arms measured 512 > 2048 (33.96 vs 33.75 PSNR) —
        # resuming under a different max_res would corrupt the arm
        "--model.sdf-field.encoding-type", "permuto",
        "--model.sdf-field.num-levels", "4",
        "--model.sdf-field.hash-features-per-level", "4",
        "--model.sdf-field.max-res", "512"]),
    # round-5 diagnosis arms (VERDICT r4 task 1): the 20k attestation missed
    # by 0.06 dB at L8xF2@512 and got WORSE at max_res 2048, so the probes
    # test (a) doubled per-row capacity at the measured-best resolution and
    # (b) the protocol's seed-noise floor at 2k before committing 20k.
    "l8xf4_512": ("neus-facto-tpu", [
        "--model.sdf-field.hash-features-per-level", "4",
        "--model.sdf-field.max-res", "512"]),
    "l8xf4_t21_512": ("neus-facto-tpu", [
        # l8xf4_512 with a 4x table (2^21 rows/level): gather cost is bound
        # by the 6.3M gathered ROWS per step, not table size (2^14 vs 2^19
        # measured within 1.5x on issue rate, probe_gather2), so collision
        # relief at the fine levels is near-free speed-wise
        "--model.sdf-field.hash-features-per-level", "4",
        "--model.sdf-field.max-res", "512",
        "--model.sdf-field.log2-hashmap-size", "21"]),
    "permuto_l8f4_512": ("neus-facto-tpu", [
        # double permuto capacity (8 levels x 4 corners = 32 rows/query,
        # 32 feature dims — same dims as the attested L8xF4 hash) to test
        # whether p4's 2k quality gap (29.56/0.0783, chamfer-accuracy
        # 0.131 = spurious surface) is capacity or lattice-fundamental.
        # Inherits the round-5 128-wide MLP proposals from the preset.
        "--model.sdf-field.encoding-type", "permuto",
        "--model.sdf-field.num-levels", "8",
        "--model.sdf-field.hash-features-per-level", "4",
        "--model.sdf-field.max-res", "512"]),
    "base512_s43": ("neus-facto-tpu", [
        # identical layout to the recorded "base" arm (L8xF2@512, seed 42);
        # only the seed differs -> the PSNR delta IS the run-to-run noise
        "--seed", "43",
        "--model.sdf-field.max-res", "512"]),
    "p8_s43": ("neus-facto-tpu-p8", [
        # 20k-scale seed replicate of the attestation carrier (run with
        # --iters 20000 and SST_SHOOTOUT_EVAL_IMAGES=49
        # SST_PARITY_GEO_RES=256 for a protocol-grade eval): measures the
        # run-to-run noise AT the protocol's decision scale, which the 2k
        # noise pair cannot (docs/parity-protocol.md noise-floor section)
        "--seed", "43"]),
    "rays4096": ("neus-facto-tpu", ["--datamanager.train-num-rays-per-batch", "4096"]),
    "neusacc": ("neus-acc", []),
}


def ensure_scene() -> None:
    if not (DATA_DIR / "meta_data.json").exists():
        from sdfstudio_tpu.data.synthetic_dtu import generate_dtu_like_dataset

        generate_dtu_like_dataset(DATA_DIR)


def base_dir(name: str) -> Path:
    return RUNS_DIR / name / CANDIDATES[name][0] / "parity"


def latest_step(name: str) -> int:
    ck = base_dir(name) / "sdfstudio_models"
    steps = [int(p.name.split("-")[1]) for p in ck.glob("step-*")
             if (p / "step.txt").exists()]
    return max(steps, default=0)


def train_candidate(name: str, iters: int, num_rays: int) -> dict:
    """Train one arm (blocking — owns the TPU while it runs). Returns the
    partial record; evals are a separate step so they can run on the CPU
    backend concurrently with the NEXT arm's TPU training (a fresh TPU
    process costs ~16 min of relay startup; a CPU eval costs zero chip
    time)."""
    method, extra = CANDIDATES[name]
    rays = num_rays
    extra = list(extra)
    if name == "rays4096":
        rays = 4096
        extra = []
    start = latest_step(name)
    wall = 0.0
    if start < iters:
        args = [
            sys.executable, "-m", "sdfstudio_tpu.scripts.train", method,
            "--experiment-name", name,
            "--output-dir", str(RUNS_DIR),
            "--timestamp", "parity",
            "--vis", "none",
            "--trainer.max-num-iterations", str(iters),
            "--trainer.defer-heavy-ops", "True",
            "--trainer.steps-per-eval-image", "0",
            "--datamanager.train-num-rays-per-batch", str(rays),
            # protocol eval runs in-process after the last checkpoint
            # (engine/final_eval.py) — a separate eval process pays ~16 min
            # of relay startup. Shootout arms compare RELATIVELY, so a
            # reduced eval (8-image PSNR spread + 192^3 marching cubes) is
            # consistent and much cheaper than the 20k protocol's full eval
            "--trainer.final-eval-gt", "dtu-like",
            "--trainer.final-eval-output", str(base_dir(name) / "parity_metrics.json"),
            "--trainer.final-eval-resolution",
            os.environ.get("SST_PARITY_GEO_RES", "192"),
            "--trainer.final-eval-max-images",
            os.environ.get("SST_SHOOTOUT_EVAL_IMAGES", "8"),
            *extra,
        ]
        if start > 0:
            args += ["--trainer.load-dir", str(base_dir(name) / "sdfstudio_models"),
                     "--trainer.load-step", str(start)]
        args += ["sdfstudio-data", "--data", str(DATA_DIR)]
        from sdfstudio_tpu.scripts.benchmarking.parity import run_with_stall_guard

        t0 = time.time()
        ret = run_with_stall_guard(args, dict(os.environ, SST_SEGMENT_CHILD="1"))
        wall = time.time() - t0
        if ret != 0:
            return {"name": name, "status": f"train failed rc={ret}"}

    rec = {
        "name": name,
        "iters": latest_step(name),
        "rays_per_batch": rays,
        "train_wall_s": round(wall, 1),
        "rays_per_s": round(rays * (iters - start) / wall, 1) if wall else None,
    }
    metrics_json = base_dir(name) / "parity_metrics.json"
    if metrics_json.exists():
        m = json.loads(metrics_json.read_text())
        if m.get("iters", 0) >= iters:
            # wall-clock rays/s should not charge the in-process eval time
            if wall and m.get("eval_seconds"):
                train_s = wall - m["eval_seconds"]
                if train_s > 0:
                    rec["train_wall_s"] = round(train_s, 1)
                    rec["rays_per_s"] = round(rays * (iters - start) / train_s, 1)
            rec["psnr"] = m.get("psnr")
            rec["chamfer_l1"] = m.get("chamfer_l1")
            rec["ssim"] = m.get("ssim")
    return rec


def eval_candidate(rec: dict, eval_platform: str | None) -> dict:
    """PSNR + Chamfer evals for a trained arm. With --eval-platform cpu
    these run as CPU-backend subprocesses (identical math; hash tables are
    bf16 on both backends) and cost zero chip time."""
    name = rec["name"]
    env = dict(os.environ)
    if eval_platform:
        env["SST_JAX_PLATFORM"] = eval_platform
    psnr_json = base_dir(name) / "eval_metrics.json"
    # reuse a finished arm's PSNR eval; train_wall_s>0 means the arm just
    # trained further, so its old eval is stale
    if rec["train_wall_s"] > 0 or not psnr_json.exists():
        subprocess.run(
            [sys.executable, "-m", "sdfstudio_tpu.scripts.eval",
             "--load-config", str(base_dir(name) / "config.yml"),
             "--output-path", str(psnr_json)],
            check=True, cwd=REPO, env=env,
        )
    psnr = json.loads(psnr_json.read_text())["results"]
    geo_args = [
        sys.executable, "-m", "sdfstudio_tpu.scripts.benchmarking.eval_geometry",
        # --load-config (not --load-dir/--method): candidates train with CLI
        # overrides over the method defaults, so the model must be rebuilt
        # from the run's own saved config or the restore shape-mismatches
        "--load-config", str(base_dir(name) / "config.yml"),
        "--gt", "dtu-like",
        "--output-mesh", str(base_dir(name) / "mesh.ply"),
    ]
    if os.environ.get("SST_PARITY_GEO_RES"):  # smoke tests shrink the MC grid
        geo_args += ["--resolution", os.environ["SST_PARITY_GEO_RES"]]
    geo = subprocess.run(
        geo_args, cwd=REPO, capture_output=True, text=True, env=env,
    )
    m = re.search(r"chamfer_l1=([0-9.]+)", geo.stdout)
    if m is None:
        print(f"[candidates] {name}: geometry eval failed:\n"
              f"{geo.stdout[-1500:]}\n{geo.stderr[-1500:]}", flush=True)
    rec = dict(rec)
    rec["psnr"] = psnr["psnr"]
    rec["chamfer_l1"] = float(m.group(1)) if m else None
    print(f"[candidates] {rec}", flush=True)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--num-rays", type=int, default=2048)
    ap.add_argument("--only", default=None, help="comma list of candidates")
    ap.add_argument("--budget-seconds", type=float, default=None)
    ap.add_argument("--eval-platform", default=None,
                    help="JAX platform for eval subprocesses (e.g. 'cpu' to "
                         "overlap evals with the next arm's TPU training)")
    args = ap.parse_args()
    names = args.only.split(",") if args.only else list(CANDIDATES)
    ensure_scene()
    t0 = time.time()
    results = []
    if OUT_JSON.exists():
        # an entry is reusable only when fully populated — a None chamfer
        # (e.g. the pre-fix geometry-eval mismatch) must re-run its evals
        results = [r for r in json.loads(OUT_JSON.read_text())
                   if r.get("name") not in names
                   or (r.get("iters", 0) >= args.iters
                       and r.get("chamfer_l1") is not None)]
    done = {r.get("name") for r in results}
    from concurrent.futures import ThreadPoolExecutor

    # evals overlap the next arm's TPU training ONLY when they run on a
    # different backend (--eval-platform cpu); same-backend evals must
    # serialize, or the eval process and the next arm's training contend on
    # the one chip and corrupt the arms' wall-clock rays/s measurements
    pool = ThreadPoolExecutor(max_workers=2 if args.eval_platform else 1)
    futures = []
    for name in names:
        if name in done:
            continue
        if args.budget_seconds and time.time() - t0 > args.budget_seconds:
            print(f"[candidates] budget exhausted before {name}; re-run to resume",
                  flush=True)
            break
        rec = train_candidate(name, args.iters, args.num_rays)
        if "status" in rec:  # train failed — record as-is, nothing to eval
            futures.append((name, None, rec))
            continue
        if rec.get("chamfer_l1") is not None:
            # the trainer's in-process final eval already produced the
            # metrics — no separate eval subprocess needed
            print(f"[candidates] {rec}", flush=True)
            futures.append((name, None, rec))
            continue
        fut = pool.submit(eval_candidate, rec, args.eval_platform)
        if not args.eval_platform:
            try:
                fut.result()  # serialize on the shared backend
            except Exception:
                pass  # recorded when collected below (result is cached)
        futures.append((name, fut, None))
    for name, fut, rec in futures:
        if fut is not None:
            try:
                rec = fut.result()
            except Exception as e:  # keep the shootout running past one bad arm
                rec = {"name": name, "status": f"eval failed: {e}"}
        results.append(rec)
        OUT_JSON.parent.mkdir(parents=True, exist_ok=True)
        OUT_JSON.write_text(json.dumps(results, indent=1))
    pool.shutdown(wait=True)
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
