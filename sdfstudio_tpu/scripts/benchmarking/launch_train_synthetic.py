"""Benchmark harness: sweep methods over synthetic scenes and report
throughput + quality (the analog of reference
scripts/benchmarking/launch_train_blender.sh, TPU-single-process)."""
from __future__ import annotations

import argparse
import dataclasses
import json
import tempfile
import time
from pathlib import Path


def run_method(method: str, data_dir: Path, steps: int, num_rays: int, out_dir: Path):
    import jax

    from sdfstudio_tpu.engine.setup import setup_trainer
    from sdfstudio_tpu.scripts.train import parse_args

    config = parse_args([method, "sdfstudio-data", "--data", str(data_dir)])
    config.datamanager = dataclasses.replace(
        config.datamanager, train_num_rays_per_batch=num_rays
    )
    config.trainer = dataclasses.replace(
        config.trainer,
        max_num_iterations=steps,
        steps_per_eval_image=0,
        steps_per_log=max(steps // 4, 1),
        steps_per_save=10 * steps,
    )
    config.output_dir = out_dir
    config.timestamp = "bench"
    config.vis = "none"
    trainer = setup_trainer(config, test_mode=True)
    trainer.setup(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        trainer.state, m = trainer._train_step(trainer.state, sub)
    jax.block_until_ready(trainer.state.params)
    t0 = time.perf_counter()
    for _ in range(steps):
        rng, sub = jax.random.split(rng)
        trainer.state, m = trainer._train_step(trainer.state, sub)
    jax.block_until_ready(trainer.state.params)
    dt = time.perf_counter() - t0
    metrics = trainer.eval_image_metrics(0)
    return {
        "method": method,
        "rays_per_sec": steps * num_rays / dt,
        "it_per_sec": steps / dt,
        **metrics,
    }


def entrypoint():
    p = argparse.ArgumentParser()
    p.add_argument("--methods", nargs="+", default=["neus", "volsdf", "neus-facto"])
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--num-rays", type=int, default=2048)
    p.add_argument("--output", type=Path, default=Path("benchmark_results.json"))
    a = p.parse_args()

    from sdfstudio_tpu.data.synthetic import generate_sphere_dataset

    data_dir = Path(tempfile.gettempdir()) / "sst_bench_suite_sphere"
    if not (data_dir / "meta_data.json").exists():
        generate_sphere_dataset(data_dir, num_images=16, width=128, height=128,
                                with_mono_prior=False, with_fg_mask=False)
    results = []
    for method in a.methods:
        print(f"=== {method}", flush=True)
        r = run_method(method, data_dir, a.steps, a.num_rays, Path(tempfile.gettempdir()) / "sst_bench_suite_out")
        print(json.dumps(r), flush=True)
        results.append(r)
    a.output.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    entrypoint()
