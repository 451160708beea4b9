"""Dynamic batch sizing (reference pipelines/dynamic_batch.py:62-87).

TPU redesign: ray counts move across power-of-two buckets, each bucket its
own compiled program; the measured samples/batch drives the bucket choice.
"""
import dataclasses

import pytest

from sdfstudio_tpu.configs.methods import get_method_config
from sdfstudio_tpu.data.synthetic import generate_sphere_dataset
from sdfstudio_tpu.engine.setup import setup_trainer
from sdfstudio_tpu.engine.trainer import Trainer


def test_to_bucket_quantization():
    assert Trainer._to_bucket(1000) == 1024
    assert Trainer._to_bucket(1) == 256  # floor
    assert Trainer._to_bucket(10_000_000) == 131072  # ceiling
    assert Trainer._to_bucket(3000) == 4096  # round-to-nearest in log2


@pytest.mark.slow
def test_instant_ngp_dynamic_batch_adapts(tmp_path):
    data = tmp_path / "sphere"
    generate_sphere_dataset(data, num_images=6, width=40, height=40)

    config = get_method_config("instant-ngp")
    from sdfstudio_tpu.data.dataparsers.sdfstudio import (
        SDFStudio,
        SDFStudioDataParserConfig,
    )

    config.dataparser = SDFStudioDataParserConfig(data=data)
    config.dataparser_class = SDFStudio
    config.trainer = dataclasses.replace(
        config.trainer,
        max_num_iterations=6,
        steps_per_log=1,
        steps_per_eval_image=0,
        steps_per_save=100,
        dynamic_update_every=1,
        # tiny budget: with 256 max samples/ray the initial bucket is
        # 131072/256 = 512 rays... then the measured (mostly-empty grid ->
        # few samples) count pushes the bucket UP
        target_num_samples=1 << 14,
    )
    config.model = dataclasses.replace(
        config.model,
        max_num_samples_per_ray=32,
        eval_num_rays_per_chunk=64,
        grid_resolution=16,
    )
    config.output_dir = tmp_path / "out"
    config.vis = "none"
    trainer = setup_trainer(config, test_mode=True)
    trainer.setup()
    assert trainer._dyn_num_rays == 512  # (1<<14)/32
    trainer.train(6)
    # the sphere scene's occupancy grid starts fully occupied -> early steps
    # produce ~max samples; with valid fractions < 1 the sample count per
    # ray undershoots 32 and the bucket should have moved off the seed value
    assert trainer._dyn_num_rays in trainer._bucket_steps
    m = trainer.unpack_metrics(trainer._train_step(trainer.state)[1])
    assert "num_rays_per_batch" in m
    assert m["num_rays_per_batch"] == trainer._dyn_num_rays
