"""All-methods tiny smoke train — the analog of reference
tests/test_train.py:49-64: every registry entry is shrunk and run for 2 real
train steps + 1 eval render on the synthetic sphere fixture."""
import dataclasses

import jax
import numpy as np
import pytest

from sdfstudio_tpu.configs.methods import method_configs
from sdfstudio_tpu.data.synthetic import generate_sphere_dataset
from sdfstudio_tpu.engine.setup import setup_trainer
from sdfstudio_tpu.scripts.train import parse_args

BLACKLIST = []  # methods not yet runnable


@pytest.fixture(scope="session")
def sphere_data(tmp_path_factory):
    out = tmp_path_factory.mktemp("data") / "sphere"
    generate_sphere_dataset(out, num_images=6, width=40, height=40, with_pairs=True)
    return out


def _maybe(cfg, **kwargs):
    """replace() only the fields that exist on this config."""
    names = {f.name for f in dataclasses.fields(cfg)}
    return dataclasses.replace(cfg, **{k: v for k, v in kwargs.items() if k in names})


def shrink(config):
    config.trainer = dataclasses.replace(
        config.trainer,
        max_num_iterations=2,
        steps_per_save=100,
        steps_per_eval_image=0,
        steps_per_log=1,
    )
    config.datamanager = dataclasses.replace(
        config.datamanager, train_num_rays_per_batch=32, eval_num_rays_per_batch=32
    )
    extra = {}
    if hasattr(config.model, "sdf_field"):
        extra["sdf_field"] = _maybe(
            config.model.sdf_field,
            num_layers=2,
            hidden_dim=32,
            geo_feat_dim=15,
            num_layers_color=2,
            hidden_dim_color=32,
            num_levels=4,
            max_res=64,
            base_res=16,
            log2_hashmap_size=10,
            hash_features_per_level=2,
        )
    config.model = _maybe(
        config.model,
        **extra,
        num_coarse_samples=8,
        num_importance_samples=8,
        num_levels=4,
        max_res=64,
        log2_hashmap_size=10,
        eval_num_rays_per_chunk=64,
        num_samples=8,
        num_samples_importance=8,
        num_up_sample_steps=2,
        num_samples_outside=4,
        num_samples_eval=8,
        num_samples_extra=4,
        max_total_iters=2,
        num_samples_interval=8,
        num_marching_steps=32,
        num_proposal_samples_per_ray=(16, 8),
        num_neus_samples_per_ray=8,
        proposal_net_args_list=(
            {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 2, "max_res": 32},
            {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 2, "max_res": 32},
        ),
        level_init=2,
        steps_per_level=10,
        # patch warping not exercised in the smoke test (needs pairs.txt)
        patch_warp_loss_mult=0.0,
    )
    # mono priors need reshape-compatible ray counts; keep rays divisible by 32
    return config


@pytest.mark.slow
@pytest.mark.parametrize("method", sorted(method_configs.keys()))
def test_method_smoke_train(method, sphere_data, tmp_path):
    if method in BLACKLIST:
        pytest.skip("not runnable yet")
    config = parse_args(
        [method, "sdfstudio-data", "--data", str(sphere_data)]
    )
    # the fixture provides pairs.txt but no sfm points
    config.dataparser = dataclasses.replace(
        config.dataparser, include_sfm_points=False,
        include_mono_prior=config.dataparser.include_mono_prior,
    )
    config = shrink(config)
    config.output_dir = tmp_path
    config.timestamp = "test"
    trainer = setup_trainer(config, test_mode=True)
    trainer.setup(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    for _ in range(2):
        rng, sub = jax.random.split(rng)
        trainer.state, metrics = trainer._train_step(trainer.state, sub)
    metrics = trainer.unpack_metrics(metrics)
    assert np.isfinite(metrics["loss"]), f"{method} loss not finite"
    out = trainer.render_image(trainer.state.params, 0)
    assert out["rgb"].shape == (40, 40, 3)
    assert np.all(np.isfinite(out["rgb"]))
