"""End-to-end training: dataparser -> datamanager -> trainer -> eval.

The JAX analog of reference tests/test_train.py (all-methods tiny smoke
train on CPU) plus a short real optimization on the synthetic sphere scene
checking the loss falls and the SDF converges toward the sphere.
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdfstudio_tpu.data.datamanager import DataManagerConfig, VanillaDataManager
from sdfstudio_tpu.data.dataparsers.sdfstudio import SDFStudio, SDFStudioDataParserConfig
from sdfstudio_tpu.data.synthetic import generate_sphere_dataset
from sdfstudio_tpu.engine.optimizers import OptimizerConfig, OptimizerGroupConfig
from sdfstudio_tpu.engine.schedulers import neus_scheduler_config
from sdfstudio_tpu.engine.trainer import Trainer, TrainerConfig
from sdfstudio_tpu.fields.sdf_field import SDFFieldConfig
from sdfstudio_tpu.models.neus import NeuSModel, NeuSModelConfig


@pytest.fixture(scope="session")
def sphere_data(tmp_path_factory):
    out = tmp_path_factory.mktemp("data") / "sphere"
    generate_sphere_dataset(out, num_images=8, width=48, height=48)
    return out


def build_trainer(data_dir: Path, out_dir: Path, max_iters=50):
    parser = SDFStudio(SDFStudioDataParserConfig(data=data_dir, include_mono_prior=True,
                                                 include_foreground_mask=True))
    train_out = parser.get_dataparser_outputs("train")
    eval_out = parser.get_dataparser_outputs("val")
    dm = VanillaDataManager(
        DataManagerConfig(train_num_rays_per_batch=128), train_out, eval_out
    )
    model = NeuSModel(
        NeuSModelConfig(
            sdf_field=SDFFieldConfig(
                num_layers=2, hidden_dim=48, geo_feat_dim=15, num_layers_color=2,
                hidden_dim_color=32, inside_outside=False, bias=0.5,
            ),
            num_samples=24,
            num_samples_importance=12,
            num_up_sample_steps=2,
            background_model="none",
            background_color="white",
            eval_num_rays_per_chunk=256,
            mono_normal_loss_mult=0.05,
            fg_mask_loss_mult=0.01,
        ),
        train_out.scene_box,
        num_train_data=dm.num_train_images,
    )
    groups = {
        "default": OptimizerGroupConfig(
            OptimizerConfig(lr=5e-4), neus_scheduler_config(warm_up_end=20, max_steps=max_iters)
        )
    }
    trainer = Trainer(
        TrainerConfig(
            max_num_iterations=max_iters,
            steps_per_save=max_iters,
            steps_per_eval_image=0,
            steps_per_log=max(max_iters // 5, 1),
        ),
        model,
        dm,
        groups,
        out_dir,
    )
    return trainer


def test_dataparser_reads_fixture(sphere_data):
    parser = SDFStudio(
        SDFStudioDataParserConfig(data=sphere_data, include_mono_prior=True, include_foreground_mask=True)
    )
    out = parser.get_dataparser_outputs("train")
    assert len(out.image_filenames) == 8
    assert out.cameras.num_cameras == 8
    assert out.scene_box.collider_type == "near_far"
    assert out.normals is not None and out.normals[0].shape == (48, 48, 3)
    # world-space normals on the sphere point outward: check center pixel of
    # image 0 has normal roughly opposing the view direction
    rb = out.cameras.generate_image_rays(0)
    d = np.asarray(rb.directions).reshape(48, 48, 3)[24, 24]
    n = out.normals[0][24, 24]
    assert float(np.dot(d, n)) < -0.8


@pytest.mark.slow
def test_train_loop_loss_falls_and_checkpoints(sphere_data, tmp_path):
    trainer = build_trainer(sphere_data, tmp_path / "run", max_iters=60)
    trainer.setup()
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(60):
        rng, sub = jax.random.split(rng)
        trainer.state, metrics = trainer._train_step(trainer.state, sub)
        losses.append(trainer.unpack_metrics(metrics)["rgb_loss"])
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    # eval render produces an image
    m = trainer.eval_image_metrics(0)
    assert np.isfinite(m["psnr"]) and np.isfinite(m["ssim"])
    # checkpoint save + load roundtrip
    trainer.save_checkpoint(60)
    ckpts = list((tmp_path / "run" / "sdfstudio_models").glob("step-*"))
    assert len(ckpts) == 1
    t2 = build_trainer(sphere_data, tmp_path / "run2", max_iters=60)
    t2.config.load_dir = tmp_path / "run" / "sdfstudio_models"
    t2.setup()
    assert int(t2.state.step) == 60
    np.testing.assert_allclose(
        np.asarray(t2.state.params["field"]["deviation"]),
        np.asarray(trainer.state.params["field"]["deviation"]),
    )


def test_train_full_loop_runs(sphere_data, tmp_path):
    trainer = build_trainer(sphere_data, tmp_path / "run", max_iters=6)
    trainer.setup()
    state = trainer.train()
    assert int(state.step) == 6


@pytest.mark.slow
def test_flexible_datamanager_geo_neus(tmp_path):
    """geo-neus: single-ref-image batches + patch warping through the
    flexible pipeline."""
    import dataclasses

    from sdfstudio_tpu.scripts.train import parse_args
    from sdfstudio_tpu.engine.setup import setup_trainer
    from tests.test_all_methods import shrink

    data = tmp_path / "sphere_pairs"
    generate_sphere_dataset(data, num_images=6, width=40, height=40,
                            with_mono_prior=False, with_fg_mask=False, with_pairs=True)
    config = parse_args(["geo-neus", "sdfstudio-data", "--data", str(data),
                         "--load-pairs", "True", "--include-sfm-points", "False"])
    config = shrink(config)
    # re-enable the patch loss that shrink() turns off, with a tiny patch
    config.model = dataclasses.replace(
        config.model, patch_warp_loss_mult=0.1, patch_size=3, topk=2
    )
    config.output_dir = tmp_path
    config.timestamp = "t"
    trainer = setup_trainer(config, test_mode=True)
    trainer.setup(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    for _ in range(2):
        rng, sub = jax.random.split(rng)
        trainer.state, metrics = trainer._train_step(trainer.state, sub)
    metrics = trainer.unpack_metrics(metrics)
    assert np.isfinite(metrics["loss"])
    assert "patch_loss" in metrics


def test_gradient_accumulation(sphere_data, tmp_path):
    """accumulate_grad_steps=2 runs and produces finite params."""
    import dataclasses

    trainer = build_trainer(sphere_data, tmp_path / "run", max_iters=4)
    trainer.config = dataclasses.replace(trainer.config, accumulate_grad_steps=2)
    trainer.setup()
    rng = jax.random.PRNGKey(0)
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        trainer.state, metrics = trainer._train_step(trainer.state, sub)
    assert np.isfinite(trainer.unpack_metrics(metrics)["loss"])
    assert all(
        bool(jnp.all(jnp.isfinite(l)))
        for l in jax.tree_util.tree_leaves(trainer.state.params)
    )
