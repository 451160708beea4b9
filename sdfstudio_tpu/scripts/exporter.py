"""sst-export: export point clouds / TSDF meshes / MC meshes.

Functional spec: reference scripts/exporter.py:32-325 (ExportPointCloud,
ExportTSDFMesh, ExportPoissonMesh, ExportMarchingCubesMesh). Poisson
reconstruction is in-tree (utils/poisson.py — FFT + screened solve) instead
of delegating to open3d.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path


def export_pointcloud(args):
    from sdfstudio_tpu.engine.setup import eval_setup
    from sdfstudio_tpu.utils.exporter_utils import generate_point_cloud

    _, trainer = eval_setup(args.load_config)
    cloud = generate_point_cloud(
        trainer, num_points=args.num_points, remove_outliers=not args.keep_outliers
    )
    args.output_dir.mkdir(parents=True, exist_ok=True)
    cloud.export(args.output_dir / "point_cloud.ply")
    print(f"wrote {args.output_dir / 'point_cloud.ply'}: {len(cloud.vertices)} points")


def export_tsdf(args):
    from sdfstudio_tpu.engine.setup import eval_setup
    from sdfstudio_tpu.utils.exporter_utils import tsdf_fusion

    _, trainer = eval_setup(args.load_config)
    mesh = tsdf_fusion(
        trainer,
        resolution=args.resolution,
        bounds_min=tuple(args.bounding_box_min),
        bounds_max=tuple(args.bounding_box_max),
    )
    args.output_dir.mkdir(parents=True, exist_ok=True)
    mesh.export(args.output_dir / "tsdf_mesh.ply")
    print(f"wrote tsdf_mesh.ply: {len(mesh.vertices)} vertices")


def export_marching_cubes(args):
    from sdfstudio_tpu.scripts.extract_mesh import main as extract_main

    extract_main(
        args.load_config,
        args.output_dir / "mc_mesh.ply",
        resolution=args.resolution,
        bounding_box_min=tuple(args.bounding_box_min),
        bounding_box_max=tuple(args.bounding_box_max),
    )


def export_poisson(args):
    """Poisson mesh from the trained field (reference exporter.py:238-266
    ExportPoissonMesh; open3d replaced by the in-tree FFT/screened solver,
    utils/poisson.py)."""
    from sdfstudio_tpu.engine.setup import eval_setup
    from sdfstudio_tpu.utils.exporter_utils import generate_point_cloud
    from sdfstudio_tpu.utils.poisson import poisson_mesh

    _, trainer = eval_setup(args.load_config)
    cloud = generate_point_cloud(
        trainer, num_points=args.num_points, remove_outliers=not args.keep_outliers
    )
    if cloud.normals is None:
        print("poisson export needs normals in the render outputs", file=sys.stderr)
        sys.exit(2)
    mesh = poisson_mesh(
        cloud.vertices,
        cloud.normals,
        resolution=args.resolution,
        bounds=(args.bounding_box_min, args.bounding_box_max),
    )
    args.output_dir.mkdir(parents=True, exist_ok=True)
    mesh.export(args.output_dir / "poisson_mesh.ply")
    print(f"wrote poisson_mesh.ply: {len(mesh.vertices)} vertices")


def entrypoint():
    from sdfstudio_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # honor SST_JAX_PLATFORM (sitecustomize pins axon)

    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (
        ("pointcloud", export_pointcloud),
        ("tsdf", export_tsdf),
        ("poisson", export_poisson),
        ("marching-cubes", export_marching_cubes),
    ):
        sp = sub.add_parser(name)
        sp.add_argument("--load-config", type=Path, required=True)
        sp.add_argument("--output-dir", type=Path, default=Path("exports"))
        sp.add_argument("--num-points", type=int, default=1000000)
        sp.add_argument("--keep-outliers", action="store_true")
        sp.add_argument("--resolution", type=int, default=128)
        sp.add_argument("--bounding-box-min", type=float, nargs=3, default=(-1, -1, -1))
        sp.add_argument("--bounding-box-max", type=float, nargs=3, default=(1, 1, 1))
        sp.set_defaults(fn=fn)
    a = p.parse_args()
    a.fn(a)


if __name__ == "__main__":
    entrypoint()
