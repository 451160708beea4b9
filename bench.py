"""Benchmark: neus-facto training throughput (train rays/sec) on one chip.

Mirrors the reference's headline number (README.md:83 — neus-facto on DTU
scan65, RTX 3090: ~22 it/s x 2048 rays ~ 45k rays/s; see BASELINE.md).
Runs the REAL full-size neus-facto training step (DTU-shape images,
2048 rays/batch, 256+96 proposal + 48 NeuS samples, hash grid 2^19) on a
synthetic scene (throughput is content-independent) and prints one JSON
line. vs_baseline is relative to the 45k rays/s RTX3090 reference number.
"""
from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

BASELINE_RAYS_PER_SEC = 45000.0  # RTX 3090 reference (BASELINE.md)


def main(num_steps: int = 50, num_rays: int = 2048, image_size: int = 384, num_images: int = 49):
    import jax

    jax.config.update("jax_default_matmul_precision", "high")

    from sdfstudio_tpu.data.synthetic import generate_sphere_dataset
    from sdfstudio_tpu.engine.setup import setup_trainer
    from sdfstudio_tpu.scripts.train import parse_args
    import dataclasses

    data_dir = Path(tempfile.gettempdir()) / f"sst_bench_sphere_{image_size}_{num_images}"
    if not (data_dir / "meta_data.json").exists():
        print("generating benchmark dataset...", file=sys.stderr)
        generate_sphere_dataset(
            data_dir, num_images=num_images, width=image_size, height=image_size,
            with_mono_prior=False, with_fg_mask=False,
        )

    config = parse_args(["neus-facto", "sdfstudio-data", "--data", str(data_dir)])
    config.datamanager = dataclasses.replace(
        config.datamanager, train_num_rays_per_batch=num_rays
    )
    config.output_dir = Path(tempfile.gettempdir()) / "sst_bench_out"
    config.timestamp = "bench"
    config.vis = "none"
    trainer = setup_trainer(config, test_mode=True)
    trainer.setup(jax.random.PRNGKey(0))

    # warmup / compile (rng is carried in TrainState; no per-step host ops)
    for _ in range(3):
        trainer.state, metrics = trainer._train_step(trainer.state)
    jax.block_until_ready(trainer.state.params)

    t0 = time.perf_counter()
    for _ in range(num_steps):
        trainer.state, metrics = trainer._train_step(trainer.state)
    jax.block_until_ready(trainer.state.params)
    dt = time.perf_counter() - t0

    rays_per_sec = num_steps * num_rays / dt
    print(
        f"steps={num_steps} rays/batch={num_rays} time={dt:.2f}s it/s={num_steps / dt:.2f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "neus-facto train rays/sec (1 chip)",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
            }
        ),
        flush=True,
    )
    # sanity: fetch the last loss AFTER the headline line — the first
    # device->host fetch costs ~minutes on this deployment (docs/tpu-design.md)
    print(f"loss={trainer.unpack_metrics(metrics)['loss']:.4f}", file=sys.stderr)


if __name__ == "__main__":
    main()
