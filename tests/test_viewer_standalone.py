"""sst-viewer: view-only session on a trained checkpoint (the analog of
reference ns-bridge-server + viewer-mode, nerfstudio/viewer/server/server.py:89).
Trains a tiny run through the REAL train CLI (writes config.yml + packed
checkpoint), then drives the viewer entrypoint's render path on it."""
import dataclasses

import pytest

from sdfstudio_tpu.data.synthetic import generate_sphere_dataset


@pytest.mark.slow
def test_viewer_smoke_on_trained_checkpoint(tmp_path):
    data = tmp_path / "sphere"
    generate_sphere_dataset(data, num_images=4, width=32, height=32)

    from sdfstudio_tpu.scripts import train as train_mod

    config = train_mod.parse_args(
        ["neus", "sdfstudio-data", "--data", str(data)]
    )
    config.trainer = dataclasses.replace(
        config.trainer, max_num_iterations=2, steps_per_save=100,
        steps_per_eval_image=0, steps_per_log=1,
    )
    config.datamanager = dataclasses.replace(
        config.datamanager, train_num_rays_per_batch=32, eval_num_rays_per_batch=32
    )
    config.model = dataclasses.replace(
        config.model,
        sdf_field=dataclasses.replace(
            config.model.sdf_field, num_layers=2, hidden_dim=32, geo_feat_dim=15,
            num_layers_color=2, hidden_dim_color=32,
        ),
        num_samples=8, num_samples_importance=8, num_up_sample_steps=2,
        num_samples_outside=4, eval_num_rays_per_chunk=64,
    )
    config.output_dir = tmp_path / "out"
    config.timestamp = "t"
    config.vis = "none"
    train_mod.main(config)

    cfg_yml = config.get_base_dir() / "config.yml"
    assert cfg_yml.exists()
    from sdfstudio_tpu.scripts.viewer import entrypoint

    entrypoint(["--load-config", str(cfg_yml), "--smoke"])
