"""Benchmark: neus-facto training throughput (train rays/sec) on one chip.

Mirrors the reference's headline number (README.md:83 — neus-facto on DTU
scan65, RTX 3090: ~22 it/s x 2048 rays ~ 45k rays/s; see BASELINE.md).
Runs the REAL full-size neus-facto training step (DTU-shape images,
2048 rays/batch, 256+96 proposal + 48 NeuS samples, hash grid 2^19) on a
synthetic scene (throughput is content-independent) and prints one JSON
line. vs_baseline is relative to the 45k rays/s RTX3090 reference number.

Measurement protocol (docs/tpu-design.md "Dispatch latency and honest
timing"): on the remote-TPU relay `jax.block_until_ready` does NOT wait for
device completion, so a dispatch-loop timing is a dispatch-rate artifact.
This bench therefore runs TWO child processes that each enqueue train work
(K-step lax.scan programs) and end with a device->host readback of the loss
(which genuinely waits), with different step counts; the per-step time is
the SLOPE between the two totals — the constant first-readback cost
(~115s, reproducible to ±0.1s) cancels. Each child stays within the relay's
cheap dispatch-queue depth (~20 calls).
"""
from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

BASELINE_RAYS_PER_SEC = 45000.0  # RTX 3090 reference (BASELINE.md)
CALLS_SMALL = 1
CALLS_LARGE = 20
NUM_RAYS = 2048


def bench_k() -> int:
    """Steps per scanned program: the method's own deployed steps_per_call
    (probe-verified per method; neus-facto-tpu ships K=25) with the
    conservative TPU auto default (10) as fallback — K>~16 faults this TPU
    compiler on the FULL neus-facto step but not the preset
    (docs/tpu-design.md; probe_scan_k.py)."""
    from sdfstudio_tpu.configs.methods import method_configs

    cfg = method_configs.get(bench_method())
    k = getattr(cfg.trainer, "steps_per_call", 0) if cfg is not None else 0
    if k:
        return k
    # no explicit config value: use the run-verified per-method safe-K
    # table (engine/safe_k.json; round 5 raised neus-facto to 25 after the
    # scan-K fault stopped reproducing post-searchsorted-rewrite)
    from sdfstudio_tpu.engine.safe_k import lookup

    return lookup(bench_method()) or 10


def bench_method() -> str:
    """Which config to benchmark.

    The headline protocol is the full-size neus-facto step (2048 rays,
    2^19 table). Once quality parity of the TPU-layout preset is
    demonstrated on the DTU-like protocol (PARITY.json at the repo root
    with ``"pass": true`` — written by the parity pipeline, PSNR +
    Chamfer-L1 at 20k iters vs the reference-config arm), the bench
    measures that parity-checked preset: it is the same method with a
    TPU-idiomatic layout, which is the number a user deploying on TPU
    gets. ``SST_BENCH_METHOD`` overrides either way.
    """
    import os

    env = os.environ.get("SST_BENCH_METHOD")
    if env:
        return env
    parity = Path(__file__).parent / "PARITY.json"
    if parity.exists():
        try:
            rec = json.loads(parity.read_text())
            if rec.get("pass") and rec.get("method"):
                return rec["method"]
        except Exception:
            pass
    return "neus-facto"


def child(num_calls: int):
    """Enqueue num_calls K-step scan programs, then readback. Prints total."""
    import dataclasses

    import jax

    jax.config.update("jax_default_matmul_precision", "high")

    from sdfstudio_tpu.data.synthetic import generate_sphere_dataset
    from sdfstudio_tpu.engine.setup import setup_trainer
    from sdfstudio_tpu.scripts.train import parse_args

    data_dir = Path(tempfile.gettempdir()) / "sst_bench_sphere_384_49"
    if not (data_dir / "meta_data.json").exists():
        print("generating benchmark dataset...", file=sys.stderr)
        generate_sphere_dataset(
            data_dir, num_images=49, width=384, height=384,
            with_mono_prior=False, with_fg_mask=False,
        )

    config = parse_args([bench_method(), "sdfstudio-data", "--data", str(data_dir)])
    config.datamanager = dataclasses.replace(
        config.datamanager, train_num_rays_per_batch=NUM_RAYS
    )
    config.output_dir = Path(tempfile.gettempdir()) / "sst_bench_out"
    config.timestamp = "bench"
    config.vis = "none"
    trainer = setup_trainer(config, test_mode=True)
    trainer.setup(jax.random.PRNGKey(0))

    # compile (persistent-cached across processes) + warm first call
    k = bench_k()
    trainer.state, _ = trainer._train_multi(trainer.state, k)
    jax.block_until_ready(trainer.state.params)

    t0 = time.perf_counter()
    for _ in range(num_calls):
        trainer.state, metrics = trainer._train_multi(trainer.state, k)
    last = metrics[-1]
    loss = float(trainer.unpack_metrics(last)["loss"])  # real device readback
    dt = time.perf_counter() - t0
    print(f"BENCH_CHILD calls={num_calls} steps={num_calls * k} "
          f"total={dt:.3f} loss={loss:.4f}", flush=True)


def run_child(num_calls: int) -> tuple[float, int]:
    out = subprocess.run(
        [sys.executable, __file__, "--child", str(num_calls)],
        capture_output=True, text=True, timeout=3600,
        cwd=Path(__file__).parent,
    )
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_CHILD"):
            print(line, file=sys.stderr)
            total = float(line.split("total=")[1].split()[0])
            steps = int(line.split("steps=")[1].split()[0])
            return total, steps
    print(out.stdout[-2000:], file=sys.stderr)
    print(out.stderr[-4000:], file=sys.stderr)
    raise RuntimeError(f"bench child (calls={num_calls}) failed")


def main():
    t_small, s_small = run_child(CALLS_SMALL)
    t_large, s_large = run_child(CALLS_LARGE)
    d_steps = s_large - s_small
    per_step = max(t_large - t_small, 1e-9) / d_steps
    rays_per_sec = NUM_RAYS / per_step
    print(
        f"slope: {per_step * 1e3:.2f} ms/step over {d_steps} steps "
        f"(T_small={t_small:.2f}s T_large={t_large:.2f}s)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"{bench_method()} train rays/sec (1 chip, honest slope)",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()
