"""Heritage-like procedural scene -> REAL heritage dataparser -> neusW
smoke train (the unbounded + masks + appearance regime; reference
heritage_dataparser.py:72-372 and the NeuralReconW method)."""
import dataclasses

import jax
import numpy as np
import pytest

from sdfstudio_tpu.data.synthetic_heritage import (
    chamfer_l1_to_gt,
    generate_heritage_like_dataset,
    gt_sdf,
    load_normalization,
    monument_sdf,
)


@pytest.fixture(scope="module")
def heritage_scene(tmp_path_factory):
    out = tmp_path_factory.mktemp("data") / "heritage_like"
    generate_heritage_like_dataset(out, num_images=8, width=64, height=64,
                                   num_points=800, seed=0)
    return out


def test_scene_files_and_normalization(heritage_scene):
    assert (heritage_scene / "sparse" / "points3D.txt").exists()
    assert (heritage_scene / "masks" / "000000.png").exists()
    center, radius = load_normalization(heritage_scene)
    # monument (~7m tall, ~8m wide) must land inside the unit sphere
    assert 3.0 < radius < 12.0
    top_n = (np.array([0, 0, 7.0]) - center) / radius
    assert np.linalg.norm(top_n) < 1.2

    # the gate opening is genuinely open: SDF positive inside the arch
    assert monument_sdf(np.array([0.0, 0.0, 3.2])) > 0.1
    # and solid inside a pillar
    assert gt_sdf(np.array([2.2, 0.0, 2.0])) < -0.1


def test_heritage_parser_and_neusw_smoke(heritage_scene, tmp_path):
    from sdfstudio_tpu.engine.setup import setup_trainer
    from sdfstudio_tpu.scripts.train import parse_args

    config = parse_args(["neusW", "heritage-data", "--data", str(heritage_scene)])
    config.trainer = dataclasses.replace(
        config.trainer, max_num_iterations=2, steps_per_save=100,
        steps_per_eval_image=0, steps_per_log=1,
    )
    config.datamanager = dataclasses.replace(
        config.datamanager, train_num_rays_per_batch=32, eval_num_rays_per_batch=32
    )
    sdf = dataclasses.replace(
        config.model.sdf_field, num_layers=2, hidden_dim=32, geo_feat_dim=15,
        num_layers_color=2, hidden_dim_color=32, num_levels=4, max_res=64,
        base_res=16, log2_hashmap_size=10,
    )
    names = {f.name for f in dataclasses.fields(config.model)}
    small = dict(
        sdf_field=sdf, num_samples=8, num_samples_importance=8,
        num_up_sample_steps=2, num_samples_outside=4,
        num_coarse_samples=8, num_surface_samples=8, eval_num_rays_per_chunk=64,
    )
    config.model = dataclasses.replace(
        config.model, **{k: v for k, v in small.items() if k in names}
    )
    config.output_dir = tmp_path
    config.timestamp = "test"
    trainer = setup_trainer(config, test_mode=True)
    # the parser must have produced a non-trivial coarse occupancy grid
    grid = trainer.model.scene_box.coarse_binary_grid
    assert grid is not None and grid.any() and not grid.all()
    # masks flowed through (heritage reads masks/<stem>.png)
    assert "fg_mask" in trainer.datamanager.train_data

    trainer.setup(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    for _ in range(2):
        rng, sub = jax.random.split(rng)
        trainer.state, metrics = trainer._train_step(trainer.state, sub)
    metrics = trainer.unpack_metrics(metrics)
    assert np.isfinite(metrics["loss"])


def test_chamfer_gt_selfcheck(heritage_scene):
    """GT surface samples in normalized space score ~0 chamfer; a wrong
    surface scores clearly worse."""
    from sdfstudio_tpu.data.synthetic_heritage import gt_surface_samples

    center, radius = load_normalization(heritage_scene)
    v = (gt_surface_samples(n=4000, seed=7) - center) / radius
    rec = chamfer_l1_to_gt(v, heritage_scene)
    assert rec["chamfer_l1"] < 0.02, rec

    sphere = np.random.RandomState(0).randn(2000, 3)
    sphere /= np.linalg.norm(sphere, axis=1, keepdims=True)
    bad = chamfer_l1_to_gt(sphere * 0.5, heritage_scene)
    assert bad["chamfer_l1"] > rec["chamfer_l1"] * 5


@pytest.mark.slow
def test_bakedsdf_on_heritage_colmap(heritage_scene, tmp_path):
    """The OTHER unbounded consumer of the scene: bakedsdf via the
    mipnerf360 COLMAP parser (scene contraction + background model),
    reference docs/sdfstudio-examples.md:15."""
    from sdfstudio_tpu.engine.setup import setup_trainer
    from sdfstudio_tpu.scripts.train import parse_args

    config = parse_args(["bakedsdf", "mipnerf360-data", "--data", str(heritage_scene)])
    config.trainer = dataclasses.replace(
        config.trainer, max_num_iterations=2, steps_per_save=100,
        steps_per_eval_image=0, steps_per_log=1,
    )
    config.datamanager = dataclasses.replace(
        config.datamanager, train_num_rays_per_batch=32, eval_num_rays_per_batch=32
    )
    sdf = dataclasses.replace(
        config.model.sdf_field, num_layers=2, hidden_dim=32, geo_feat_dim=15,
        num_layers_color=2, hidden_dim_color=32, num_levels=4, max_res=64,
        base_res=16, log2_hashmap_size=10,
    )
    names = {f.name for f in dataclasses.fields(config.model)}
    small = dict(
        sdf_field=sdf, num_samples=8, num_samples_importance=8,
        num_samples_outside=4, eval_num_rays_per_chunk=64,
        num_proposal_samples_per_ray=(16, 8),
        proposal_net_args_list=(
            {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 2, "max_res": 32},
            {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 2, "max_res": 32},
        ),
    )
    config.model = dataclasses.replace(
        config.model, **{k: v for k, v in small.items() if k in names}
    )
    config.output_dir = tmp_path
    config.timestamp = "test"
    trainer = setup_trainer(config, test_mode=True)
    trainer.setup(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    for _ in range(2):
        rng, sub = jax.random.split(rng)
        trainer.state, metrics = trainer._train_step(trainer.state, sub)
    assert np.isfinite(trainer.unpack_metrics(metrics)["loss"])
