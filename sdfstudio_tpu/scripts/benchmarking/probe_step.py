"""Slope-probe the train step on the current backend (honest timing).

On remote-relay TPU deployments ``jax.block_until_ready`` returns when the
dispatch queue drains, not when the device finishes, so dispatch-loop
timings are meaningless (docs/tpu-design.md "Dispatch latency and honest
timing"). This tool times N calls of a K-step ``lax.scan`` program ending
in a device->host readback (which genuinely waits) — with N*K large the
constant warm/readback costs are amortized away; for maximum rigor run
twice with different N and take the slope (bench.py automates that for the
flagship config).

Examples:
    python -m sdfstudio_tpu.scripts.benchmarking.probe_step
    python -m sdfstudio_tpu.scripts.benchmarking.probe_step \
        --method neus-facto-tpu --num-rays 4096 --step0 10000
"""
from __future__ import annotations

import argparse
import dataclasses
import tempfile
import time
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--method", default="neus-facto")
    ap.add_argument("--num-rays", type=int, default=2048)
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--steps-per-call", type=int, default=10)
    ap.add_argument("--step0", type=int, default=0,
                    help="start from this step (schedules are step-dependent)")
    ap.add_argument("--data", type=Path, default=None,
                    help="dataset dir (default: generated synthetic sphere)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "high")

    from sdfstudio_tpu.data.synthetic import generate_sphere_dataset
    from sdfstudio_tpu.engine.setup import setup_trainer
    from sdfstudio_tpu.scripts.train import parse_args as parse_train_args

    data_dir = args.data
    if data_dir is None:
        data_dir = Path(tempfile.gettempdir()) / "sst_bench_sphere_384_49"
        if not (data_dir / "meta_data.json").exists():
            generate_sphere_dataset(
                data_dir, num_images=49, width=384, height=384,
                with_mono_prior=False, with_fg_mask=False,
            )

    config = parse_train_args([args.method, "sdfstudio-data", "--data", str(data_dir)])
    config.datamanager = dataclasses.replace(
        config.datamanager, train_num_rays_per_batch=args.num_rays
    )
    config.output_dir = Path(tempfile.gettempdir()) / "sst_probe_out"
    config.timestamp = "probe"
    config.vis = "none"
    trainer = setup_trainer(config, test_mode=True)
    trainer.setup(jax.random.PRNGKey(0))
    if args.step0:
        trainer.state = trainer.state.replace(
            step=jnp.asarray(args.step0, trainer.state.step.dtype)
        )

    K = args.steps_per_call
    t0 = time.perf_counter()
    trainer.state, _ = trainer._train_multi(trainer.state, K)  # compile + warm
    jax.block_until_ready(trainer.state.params)
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    metrics = None
    for _ in range(args.calls):
        trainer.state, metrics = trainer._train_multi(trainer.state, K)
    last = jax.tree_util.tree_map(lambda x: x[-1], metrics)
    loss = float(trainer.unpack_metrics(last)["loss"])  # honest readback
    dt = time.perf_counter() - t0

    steps = K * args.calls
    print(
        f"PROBE method={args.method} rays={args.num_rays} step0={args.step0} "
        f"steps={steps} per_step_ms={dt / steps * 1e3:.0f} "
        f"rays_per_s={args.num_rays * steps / dt:,.0f} "
        f"compile_s={t_compile:.1f} loss={loss:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
