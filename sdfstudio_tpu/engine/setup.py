"""Pipeline assembly + eval setup.

Functional spec: reference nerfstudio/pipelines/base_pipeline.py:213-250
(build datamanager + model) and nerfstudio/utils/eval_utils.py:36-107
(rebuild from a saved config.yml + load latest checkpoint).
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

from sdfstudio_tpu.configs.base import Config
from sdfstudio_tpu.data.datamanager import VanillaDataManager
from sdfstudio_tpu.engine.optimizers import OptimizerConfig, OptimizerGroupConfig
from sdfstudio_tpu.engine.trainer import Trainer
from sdfstudio_tpu.utils.writer import Writer


def setup_trainer(config: Config, test_mode: bool = False) -> Trainer:
    """Build dataparser -> datamanager -> model -> trainer from a Config."""
    assert config.dataparser_class is not None and config.model_class is not None
    if getattr(config, "matmul_precision", None):
        import jax

        jax.config.update("jax_default_matmul_precision", config.matmul_precision)
    from sdfstudio_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    if getattr(config, "enable_profiler", False):
        from sdfstudio_tpu.utils import profiler

        profiler.enable()  # flush table at exit is self-registered
    if config.data is not None:
        config.dataparser.data = Path(config.data)
    parser = config.dataparser_class(config.dataparser)
    train_outputs = parser.get_dataparser_outputs("train")
    try:
        eval_outputs = parser.get_dataparser_outputs("val")
    except Exception:
        eval_outputs = None

    if config.datamanager.kind == "flexible":
        from sdfstudio_tpu.data.datamanager import FlexibleDataManager

        datamanager = FlexibleDataManager(
            config.datamanager,
            train_outputs,
            eval_outputs,
            neighbors_num=config.datamanager.neighbors_num,
        )
    else:
        datamanager = VanillaDataManager(config.datamanager, train_outputs, eval_outputs)
    model = config.model_class(
        config.model, train_outputs.scene_box, datamanager.num_train_images
    )

    optimizers = dict(config.optimizers)
    if (
        config.datamanager.camera_optimizer.mode != "off"
        and "camera_opt" not in optimizers
    ):
        # reference auto-adds the camera-opt group (engine/optimizers.py:82-90)
        optimizers["camera_opt"] = OptimizerGroupConfig(
            OptimizerConfig(lr=6e-4, eps=1e-8, weight_decay=1e-2)
        )

    if config.trainer.steps_per_call == 0:
        # auto K: consult the probe-verified per-method table (engine/safe_k.py)
        # on TPU backends; unprobed methods keep the trainer's global auto-10
        import dataclasses

        import jax

        from sdfstudio_tpu.engine import safe_k

        if jax.default_backend() != "cpu" and (k := safe_k.lookup(config.method_name)):
            config.trainer = dataclasses.replace(config.trainer, steps_per_call=k)

    base_dir = config.get_base_dir()
    writer = Writer(
        base_dir,
        use_tensorboard=(config.vis == "tensorboard") and not test_mode,
        use_wandb=(config.vis == "wandb") and not test_mode,
        experiment_name=f"{config.experiment_name}/{config.method_name}",
        banner=f"[sdfstudio-tpu] method={config.method_name} out={base_dir}",
    )
    return Trainer(
        config.trainer, model, datamanager, optimizers, base_dir, writer=writer
    )


def eval_setup(config_path: Path, test_mode: bool = True) -> Tuple[Config, Trainer]:
    """Load a saved config.yml, rebuild the pipeline, restore the latest
    checkpoint (reference eval_utils.py:36-107)."""
    config = Config.load_config(config_path)
    trainer = setup_trainer(config, test_mode=test_mode)
    trainer.config.load_dir = config.get_checkpoint_dir()
    # a resuming segment bakes its --trainer.load-step into the saved
    # config.yml; that step is usually pruned by save_only_latest_checkpoint,
    # so eval must always pick the latest complete checkpoint instead
    trainer.config.load_step = None
    trainer.setup()
    return config, trainer
