"""Find the largest safe ``steps_per_call`` (scan length K) for a method.

Background: scanning the neus-facto train step with ``lax.scan`` length
K>=16 faults this TPU deployment's compiler ("TPU device error"), while
K<=10 compiles and runs (docs/tpu-design.md). The failing K depends on
program size, so it can shift with model configuration. This tool probes
increasing K values — each in a fresh subprocess, because a compiler fault
can poison the parent's TPU client — and reports the largest K that
compiles AND executes a step window correctly.

The trainer's default stays at the conservative auto K=10
(engine/trainer.py); pass the probed value via ``--trainer.steps-per-call``
for long runs where dispatch amortization matters.

Usage:
    python -m sdfstudio_tpu.scripts.benchmarking.probe_scan_k \
        [--method neus-facto] [--ks 10,16,20,25,32]
"""
from __future__ import annotations

import argparse
import subprocess
import sys
import tempfile
from pathlib import Path


def child(method: str, k: int) -> None:
    import dataclasses

    import jax

    from sdfstudio_tpu.data.synthetic import generate_sphere_dataset
    from sdfstudio_tpu.engine.setup import setup_trainer
    from sdfstudio_tpu.scripts.train import parse_args

    data_dir = Path(tempfile.gettempdir()) / "sst_bench_sphere_384_49"
    if not (data_dir / "meta_data.json").exists():
        generate_sphere_dataset(
            data_dir, num_images=49, width=384, height=384,
            with_mono_prior=False, with_fg_mask=False,
        )
    config = parse_args([method, "sdfstudio-data", "--data", str(data_dir)])
    config.datamanager = dataclasses.replace(
        config.datamanager, train_num_rays_per_batch=2048
    )
    config.output_dir = Path(tempfile.gettempdir()) / "sst_scan_k_out"
    config.timestamp = "probe"
    config.vis = "none"
    trainer = setup_trainer(config, test_mode=True)
    trainer.setup(jax.random.PRNGKey(0))
    trainer.state, metrics = trainer._train_multi(trainer.state, k)
    last = jax.tree_util.tree_map(lambda x: x[-1], metrics)
    loss = float(trainer.unpack_metrics(last)["loss"])
    assert loss == loss, "NaN loss"
    print(f"SCANK_OK k={k} loss={loss:.4f}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--method", default="neus-facto")
    ap.add_argument("--ks", default="10,16,20,25,32")
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--record", action="store_true",
                    help="write the largest verified K into "
                         "engine/safe_k.json (consulted by setup_trainer "
                         "whenever steps_per_call is left at auto)")
    args = ap.parse_args()

    best = None
    for k in [int(s) for s in args.ks.split(",")]:
        print(f"probing K={k} ...", flush=True)
        try:
            out = subprocess.run(
                [sys.executable, __file__, "--child", args.method, str(k)],
                capture_output=True, text=True, timeout=args.timeout,
            )
        except subprocess.TimeoutExpired:
            print(f"K={k}: TIMEOUT (compile hang) — stopping", flush=True)
            break
        if any(l.startswith("SCANK_OK") for l in out.stdout.splitlines()):
            print(f"K={k}: ok", flush=True)
            best = k
        else:
            tail = (out.stderr or out.stdout)[-500:]
            print(f"K={k}: FAILED — stopping\n{tail}", flush=True)
            break
    print(f"largest safe steps_per_call: {best}", flush=True)
    if args.record and best is not None:
        from sdfstudio_tpu.engine import safe_k

        safe_k.record(args.method, best)
        print(f"recorded {args.method}: {best} -> {safe_k.TABLE_PATH}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]))
    else:
        main()
