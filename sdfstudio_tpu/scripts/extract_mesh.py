"""sst-extract-mesh: marching-cubes mesh extraction from a checkpoint.

Functional spec: reference scripts/extract_mesh.py:30-151 (bounded sliding
MC / unbounded with contraction / unisurf occupancy).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np


def main(
    load_config: Path,
    output_path: Path,
    resolution: int = 512,
    bounding_box_min=(-1.0, -1.0, -1.0),
    bounding_box_max=(1.0, 1.0, 1.0),
    is_occupancy: bool = False,
    use_contraction: bool = False,
    create_visibility_mask: bool = False,
    chunk: int = 131072,
    simplify_mesh: bool = False,
    num_target_faces: int = 1_000_000,
):
    from sdfstudio_tpu.engine.setup import eval_setup
    from sdfstudio_tpu.ops.density import unisurf_occupancy
    from sdfstudio_tpu.utils.marching_cubes import (
        get_surface_occupancy,
        get_surface_sliding,
        get_surface_sliding_with_contraction,
    )
    from sdfstudio_tpu.utils.marching_cubes import simplify_mesh as _simplify

    config, trainer = eval_setup(load_config)
    model = trainer.model
    field_params = trainer.state.params["field"]
    sdf_raw = model.field.sdf_fn(field_params)

    if use_contraction:
        # queries arrive already in contracted space; optionally restrict to
        # observed space via the visibility mask (base_pipeline.py:370-424)
        vis_fn = None
        if create_visibility_mask:
            from sdfstudio_tpu.utils.visibility import (
                compute_visibility_mask,
                visibility_mask_fn,
            )

            mask = compute_visibility_mask(trainer)
            vis_fn = visibility_mask_fn(mask)
        mesh = get_surface_sliding_with_contraction(
            lambda pts: sdf_raw(pts),
            resolution=resolution,
            bounding_box_min=(-2.0, -2.0, -2.0),
            bounding_box_max=(2.0, 2.0, 2.0),
            visibility_mask_fn=vis_fn,
            order=np.inf if model.config.scene_contraction_norm == "inf" else None,
            chunk=chunk,
        )
    elif is_occupancy:
        mesh = get_surface_occupancy(
            lambda pts: unisurf_occupancy(sdf_raw(pts)),
            resolution=resolution,
            level=0.5,
            chunk=chunk,
        )
    else:
        mesh = get_surface_sliding(
            lambda pts: sdf_raw(model.field.contract_positions(pts)),
            resolution=resolution,
            bounding_box_min=tuple(bounding_box_min),
            bounding_box_max=tuple(bounding_box_max),
            block_res=min(resolution, 256),
            chunk=chunk,
        )
    if simplify_mesh:
        # reference decimates via pymeshlab (marching_cubes.py:162-167);
        # here: in-tree C++ quadric edge collapse
        mesh = _simplify(mesh, num_target_faces)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    mesh.export(output_path)
    print(f"wrote {output_path}: {len(mesh.vertices)} vertices, {len(mesh.faces)} faces")


def entrypoint():
    from sdfstudio_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # honor SST_JAX_PLATFORM (sitecustomize pins axon)

    p = argparse.ArgumentParser()
    p.add_argument("--load-config", type=Path, required=True)
    p.add_argument("--output-path", type=Path, default=Path("mesh.ply"))
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--bounding-box-min", type=float, nargs=3, default=(-1.0, -1.0, -1.0))
    p.add_argument("--bounding-box-max", type=float, nargs=3, default=(1.0, 1.0, 1.0))
    p.add_argument("--is-occupancy", action="store_true")
    p.add_argument("--use-contraction", action="store_true", dest="use_contraction")
    p.add_argument("--create-visibility-mask", action="store_true", dest="create_visibility_mask")
    p.add_argument("--chunk", type=int, default=131072)
    p.add_argument("--simplify-mesh", action="store_true", dest="simplify_mesh")
    p.add_argument("--num-target-faces", type=int, default=1_000_000)
    a = p.parse_args()
    main(
        a.load_config,
        a.output_path,
        a.resolution,
        a.bounding_box_min,
        a.bounding_box_max,
        a.is_occupancy,
        a.use_contraction,
        a.create_visibility_mask,
        a.chunk,
        a.simplify_mesh,
        a.num_target_faces,
    )


if __name__ == "__main__":
    entrypoint()
