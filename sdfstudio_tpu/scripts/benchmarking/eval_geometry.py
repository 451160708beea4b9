"""Geometry benchmark on the synthetic sphere scene: extract a mesh from a
checkpoint and report Chamfer-L1 against the analytic sphere.

The synthetic scene has known geometry (a sphere of radius
``sdfstudio_tpu.data.synthetic.generate_sphere_dataset(radius=...)``), so
this is the framework's analog of the reference's DTU Chamfer evaluation
(no DTU data ships in this environment). NOTE: without foreground-mask
supervision a white-background scene is shape-radiance ambiguous — NeuS
learns a white "curtain" shell (measured: zero crossing at r~1.3 for a
r=0.5 sphere with fg masks off, PSNR 30+ regardless). Train with
``--with-fg-mask`` data + ``fg_mask_loss_mult>0`` for meaningful Chamfer.

Usage:
    python -m sdfstudio_tpu.scripts.benchmarking.eval_geometry \
        --load-dir <run>/sdfstudio_models --method neus-facto \
        --data /tmp/sst_bench_sphere_384_49 --radius 0.5
"""
from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path

import numpy as np


def chamfer_l1_to_sphere(verts: np.ndarray, radius: float, center=None) -> dict:
    """Chamfer-L1 between mesh vertices and an analytic sphere.

    accuracy: mean distance mesh->sphere = mean | |v| - r |.
    completeness: sample the sphere uniformly, distance to nearest vertex.
    """
    center = np.zeros(3) if center is None else np.asarray(center)
    v = verts - center
    r = np.linalg.norm(v, axis=1)
    accuracy = float(np.abs(r - radius).mean())

    # uniform sphere samples (fibonacci) -> nearest-vertex distance
    n = 20000
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    pts = radius * np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)], -1
    )
    from scipy.spatial import cKDTree

    d_min, _ = cKDTree(v).query(pts, k=1)
    completeness = float(np.asarray(d_min).mean())
    return {
        "accuracy": accuracy,
        "completeness": completeness,
        "chamfer_l1": 0.5 * (accuracy + completeness),
    }


def main() -> None:
    from sdfstudio_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--load-dir", type=Path, default=None)
    ap.add_argument("--load-config", type=Path, default=None,
                    help="run's saved config.yml — rebuilds the EXACT trained "
                    "model (required when the run used CLI overrides over the "
                    "method defaults, e.g. preset_candidates layouts; "
                    "--load-dir/--method rebuilds method defaults only)")
    ap.add_argument("--method", default="neus-facto")
    ap.add_argument("--data", type=Path, default=None)
    ap.add_argument("--radius", type=float, default=0.5)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--bound", type=float, default=1.0)
    ap.add_argument("--output-mesh", type=Path, default=None)
    ap.add_argument(
        "--gt", choices=["sphere", "dtu-like", "heritage-like"], default="sphere",
        help="analytic ground truth: 'sphere' (generate_sphere_dataset), "
        "'dtu-like' (synthetic_dtu.gt_sdf — the DTU-scan65-protocol scene), or "
        "'heritage-like' (synthetic_heritage.gt_sdf, evaluated in the "
        "heritage parser's normalized frame)",
    )
    ap.add_argument(
        "--dataparser", default=None,
        help="dataparser subcommand (default: sdfstudio-data; heritage-like "
        "GT implies heritage-data)",
    )
    args = ap.parse_args()

    import jax

    from sdfstudio_tpu.utils.marching_cubes import get_surface_sliding

    if args.load_config is not None:
        # rebuild from the run's own saved config: exact trained layout
        # (reference eval_utils.eval_setup pattern)
        from sdfstudio_tpu.engine.setup import eval_setup

        _, trainer = eval_setup(args.load_config)
    else:
        if args.load_dir is None or args.data is None:
            raise SystemExit("need --load-config OR (--load-dir and --data)")
        from sdfstudio_tpu.engine.setup import setup_trainer
        from sdfstudio_tpu.scripts.train import parse_args as parse_train_args

        parser_cmd = args.dataparser or (
            "heritage-data" if args.gt == "heritage-like" else "sdfstudio-data"
        )
        config = parse_train_args([args.method, parser_cmd, "--data", str(args.data)])
        config.output_dir = Path("/tmp/sst_eval_geometry")
        config.timestamp = "g"
        config.vis = "none"
        config.trainer = dataclasses.replace(config.trainer, load_dir=args.load_dir)
        trainer = setup_trainer(config, test_mode=True)
        trainer.setup(jax.random.PRNGKey(0))

    field = trainer.model.field
    sdf_fn = field.sdf_fn(trainer.state.params["field"])
    b = args.bound
    mesh = get_surface_sliding(
        sdf_fn,
        resolution=args.resolution,
        bounding_box_min=(-b,) * 3,
        bounding_box_max=(b,) * 3,
    )
    if args.output_mesh is not None:
        mesh.export(args.output_mesh)
    v = np.asarray(mesh.vertices)
    if len(v) == 0:
        print("GEOMETRY no surface found", flush=True)
        return
    if args.gt == "dtu-like":
        from sdfstudio_tpu.data.synthetic_dtu import chamfer_l1_to_gt

        m = chamfer_l1_to_gt(v)
        gt_note = "(gt=dtu-like)"
    elif args.gt == "heritage-like":
        from sdfstudio_tpu.data.synthetic_heritage import chamfer_l1_to_gt

        if args.data is None:
            raise SystemExit("--gt heritage-like needs --data (scene frame)")
        m = chamfer_l1_to_gt(v, args.data)
        gt_note = "(gt=heritage-like, normalized units)"
    else:
        m = chamfer_l1_to_sphere(v, args.radius)
        gt_note = f"(radius={args.radius})"
    print(
        f"GEOMETRY verts={len(v)} chamfer_l1={m['chamfer_l1']:.4f} "
        f"accuracy={m['accuracy']:.4f} completeness={m['completeness']:.4f} "
        f"{gt_note}",
        flush=True,
    )


if __name__ == "__main__":
    main()
