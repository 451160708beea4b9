"""End-to-end model smoke tests: forward + loss + grad under jit
(the JAX analog of the reference's all-methods 2-step CPU train smoke,
tests/test_train.py:49-64)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.core.scene_box import SceneBox
from sdfstudio_tpu.fields.sdf_field import SDFFieldConfig
from sdfstudio_tpu.models.neus import NeuSModel, NeuSModelConfig
from sdfstudio_tpu.models.volsdf import VolSDFModel, VolSDFModelConfig

TINY_SDF = SDFFieldConfig(
    num_layers=2,
    hidden_dim=32,
    geo_feat_dim=15,
    num_layers_color=2,
    hidden_dim_color=32,
    inside_outside=False,
)


def tiny_bundle(R=8):
    origins = jnp.zeros((R, 3)).at[:, 2].set(-2.0)
    return RayBundle(
        origins=origins,
        directions=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (R, 1)),
        pixel_area=jnp.ones((R, 1)) * 1e-6,
        camera_indices=jnp.zeros((R,), jnp.int32),
        directions_norm=jnp.ones((R, 1)),
    )


def run_model(model_cls, config):
    model = model_cls(config, SceneBox(collider_type="near_far", near=0.5, far=3.5), num_train_data=2)
    params = model.init(jax.random.PRNGKey(0))
    rb = tiny_bundle(8)
    batch = {"image": jnp.ones((8, 3)) * 0.5}

    def loss_fn(p, rng, step):
        sched = model.schedules(step)
        outputs = model.get_outputs(p, rb, rng=rng, sched=sched, train=True)
        losses = model.get_loss_dict(p, outputs, batch, sched, rng)
        return sum(losses.values()), (outputs, losses)

    (loss, (outputs, losses)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params, jax.random.PRNGKey(1), jnp.asarray(100.0))
    return loss, outputs, losses, grads


@pytest.mark.parametrize(
    "model_cls,config",
    [
        (
            NeuSModel,
            NeuSModelConfig(
                sdf_field=TINY_SDF,
                num_samples=16,
                num_samples_importance=8,
                num_up_sample_steps=2,
                background_model="none",
            ),
        ),
        (
            VolSDFModel,
            VolSDFModelConfig(
                sdf_field=TINY_SDF,
                num_samples=8,
                num_samples_eval=16,
                num_samples_extra=8,
                max_total_iters=2,
                background_model="none",
            ),
        ),
    ],
    ids=["neus", "volsdf"],
)
def test_surface_model_train_step(model_cls, config):
    loss, outputs, losses, grads = run_model(model_cls, config)
    assert np.isfinite(float(loss))
    assert "rgb_loss" in losses and "eikonal_loss" in losses
    assert outputs["rgb"].shape == (8, 3)
    assert outputs["depth"].shape == (8, 1)
    assert outputs["normal"].shape == (8, 3)
    # gradients flow into the SDF field
    leaves = jax.tree_util.tree_leaves(grads["field"])
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert np.isfinite(total) and total > 0


def test_neus_with_mlp_background():
    config = NeuSModelConfig(
        sdf_field=TINY_SDF,
        num_samples=16,
        num_samples_importance=8,
        num_up_sample_steps=2,
        background_model="mlp",
        num_samples_outside=8,
    )
    loss, outputs, losses, grads = run_model(NeuSModel, config)
    assert np.isfinite(float(loss))
    bg_leaves = jax.tree_util.tree_leaves(grads["field_background"])
    assert sum(float(jnp.abs(l).sum()) for l in bg_leaves) > 0


def test_neus_cos_anneal_schedule():
    model = NeuSModel(
        NeuSModelConfig(sdf_field=TINY_SDF, background_model="none"),
        SceneBox(collider_type="near_far"),
        num_train_data=1,
    )
    assert float(model.schedules(jnp.asarray(0.0))["cos_anneal_ratio"]) == 0.0
    assert float(model.schedules(jnp.asarray(25000.0))["cos_anneal_ratio"]) == 0.5
    assert float(model.schedules(jnp.asarray(100000.0))["cos_anneal_ratio"]) == 1.0
