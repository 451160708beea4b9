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
    # ablation overrides (cost bisection)
    ap.add_argument("--no-grid", action="store_true",
                    help="use_grid_feature=False on the SDF field")
    ap.add_argument("--neus-samples", type=int, default=None)
    ap.add_argument("--prop-samples", type=str, default=None,
                    help="comma list, e.g. 128,48")
    ap.add_argument("--num-levels", type=int, default=None)
    ap.add_argument("--features-per-level", type=int, default=None,
                    help="SDF hash/permuto features per level (trade levels "
                         "for features at equal capacity: L4xF4 halves the "
                         "gather count of L8xF2)")
    ap.add_argument("--hidden-dim", type=int, default=None,
                    help="SDF geo/color MLP width")
    ap.add_argument("--log2-hashmap", type=int, default=None,
                    help="SDF hash table log2 size")
    ap.add_argument("--encoding", default=None,
                    help="SDF field encoding_type override (hash | permuto | ...)")
    ap.add_argument("--table-dtype", default=None,
                    help="SDF hash/permuto table dtype (float32 | bfloat16)")
    ap.add_argument("--accumulate", type=int, default=1,
                    help="gradient-accumulation sub-batches per update "
                         "(effective batch = accumulate x num-rays at the "
                         "peak memory of ONE sub-batch — the batch-scaling "
                         "path, docs/tpu-design.md 8192-ray analysis)")
    ap.add_argument("--trace", type=Path, default=None,
                    help="capture a jax.profiler device trace of the timed "
                         "calls into this directory (view with tensorboard "
                         "--logdir DIR; docs/tpu-design.md profiling protocol)")
    ap.add_argument("--analyze", action="store_true",
                    help="compile-only: print XLA cost analysis (flops, bytes "
                         "accessed) of the 1-step program and dump optimized "
                         "HLO to /tmp/step_hlo.txt instead of timing")
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
    field_over = {}
    if args.no_grid:
        field_over["use_grid_feature"] = False
    if args.num_levels is not None:
        field_over["num_levels"] = args.num_levels
    if args.features_per_level is not None:
        field_over["hash_features_per_level"] = args.features_per_level
    if args.hidden_dim is not None:
        field_over["hidden_dim"] = args.hidden_dim
        field_over["hidden_dim_color"] = args.hidden_dim
    if args.log2_hashmap is not None:
        field_over["log2_hashmap_size"] = args.log2_hashmap
    if args.encoding is not None:
        field_over["encoding_type"] = args.encoding
    if args.table_dtype is not None:
        field_over["hash_table_dtype"] = args.table_dtype
    model_over = {}
    if field_over and hasattr(config.model, "sdf_field"):
        model_over["sdf_field"] = dataclasses.replace(config.model.sdf_field, **field_over)
    if args.neus_samples is not None:
        model_over["num_neus_samples_per_ray"] = args.neus_samples
    if args.prop_samples is not None:
        model_over["num_proposal_samples_per_ray"] = tuple(
            int(s) for s in args.prop_samples.split(",")
        )
    if model_over:
        config.model = dataclasses.replace(config.model, **model_over)
    if args.accumulate > 1:
        config.trainer = dataclasses.replace(
            config.trainer, accumulate_grad_steps=args.accumulate
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

    if args.analyze:
        lowered = jax.jit(trainer._train_step_impl).lower(
            trainer.state,
            trainer.datamanager.train_data,
            trainer.datamanager.train_cameras,
        )
        compiled = lowered.compile()
        Path("/tmp/step_hlo.txt").write_text(compiled.as_text())
        try:
            cost = compiled.cost_analysis()
            cost = cost[0] if isinstance(cost, list) else cost
            flops = cost.get("flops", 0.0)
            bytes_acc = cost.get("bytes accessed", 0.0)
            print(f"ANALYZE flops={flops:.3e} bytes_accessed={bytes_acc:.3e}")
            for k in sorted(cost):
                if k.startswith("bytes accessed") and cost[k] > 1e8:
                    print(f"  {k}: {cost[k]:.3e}")
        except Exception as e:  # cost analysis support varies by backend
            print(f"ANALYZE cost_analysis unavailable: {e}")
        try:
            mem = compiled.memory_analysis()
            print(
                f"ANALYZE temp_bytes={mem.temp_size_in_bytes:.3e} "
                f"argument_bytes={mem.argument_size_in_bytes:.3e} "
                f"output_bytes={mem.output_size_in_bytes:.3e}"
            )
        except Exception as e:
            print(f"ANALYZE memory_analysis unavailable: {e}")
        print("ANALYZE hlo written to /tmp/step_hlo.txt")
        return

    K = args.steps_per_call
    t0 = time.perf_counter()
    trainer.state, _ = trainer._train_multi(trainer.state, K)  # compile + warm
    jax.block_until_ready(trainer.state.params)
    t_compile = time.perf_counter() - t0

    from contextlib import nullcontext

    from sdfstudio_tpu.utils.profiler import jax_trace

    t0 = time.perf_counter()
    metrics = None
    with jax_trace(str(args.trace)) if args.trace else nullcontext():
        for _ in range(args.calls):
            trainer.state, metrics = trainer._train_multi(trainer.state, K)
        last = jax.tree_util.tree_map(lambda x: x[-1], metrics)
        loss = float(trainer.unpack_metrics(last)["loss"])  # honest readback
    dt = time.perf_counter() - t0
    if args.trace:
        print(f"TRACE written to {args.trace}", flush=True)

    steps = K * args.calls
    rays_per_step = args.num_rays * args.accumulate
    print(
        f"PROBE method={args.method} rays={args.num_rays} "
        f"accumulate={args.accumulate} step0={args.step0} "
        f"steps={steps} per_step_ms={dt / steps * 1e3:.0f} "
        f"rays_per_s={rays_per_step * steps / dt:,.0f} "
        f"compile_s={t_compile:.1f} loss={loss:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
