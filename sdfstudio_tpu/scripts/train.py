"""sst-train: training entry point.

Functional spec: reference scripts/train.py:220-259 (tyro CLI -> config ->
launch -> train). CLI shape mirrors the reference:

    sst-train neus-facto --experiment-name run1 \
        --pipeline.model.sdf-field.inside-outside False \
        sdfstudio-data --data data/DTU/scan65 --include-mono-prior False

Distribution: no mp.spawn/NCCL — the trainer's jitted step runs over the
full jax device mesh in this one process (parallel/mesh.py).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

from sdfstudio_tpu.configs.base import Config, override_nested
from sdfstudio_tpu.configs.methods import descriptions, get_method_config, method_configs

DATAPARSERS = {}


def _register_dataparsers():
    global DATAPARSERS
    from sdfstudio_tpu.data.dataparsers.sdfstudio import (
        SDFStudio,
        SDFStudioDataParserConfig,
    )

    DATAPARSERS["sdfstudio-data"] = (SDFStudioDataParserConfig, SDFStudio)
    try:
        from sdfstudio_tpu.data.dataparsers.blender import (
            Blender,
            BlenderDataParserConfig,
        )

        DATAPARSERS["blender-data"] = (BlenderDataParserConfig, Blender)
    except ImportError:
        pass
    try:
        from sdfstudio_tpu.data.dataparsers.nerfstudio_parser import (
            Nerfstudio,
            NerfstudioDataParserConfig,
        )

        DATAPARSERS["nerfstudio-data"] = (NerfstudioDataParserConfig, Nerfstudio)
    except ImportError:
        pass
    from sdfstudio_tpu.data.dataparsers.colmap_family import (
        Heritage,
        HeritageDataParserConfig,
        Mipnerf360,
        Mipnerf360DataParserConfig,
        Phototourism,
        PhototourismDataParserConfig,
    )
    from sdfstudio_tpu.data.dataparsers.misc_parsers import (
        DNeRF,
        DNeRFDataParserConfig,
        Friends,
        FriendsDataParserConfig,
        InstantNGP,
        InstantNGPDataParserConfig,
        Record3D,
        Record3DDataParserConfig,
    )
    from sdfstudio_tpu.data.dataparsers.monosdf import (
        MonoSDFDataParserConfig,
        MonoSDFScene,
    )

    DATAPARSERS.update(
        {
            "monosdf-data": (MonoSDFDataParserConfig, MonoSDFScene),
            "mipnerf360-data": (Mipnerf360DataParserConfig, Mipnerf360),
            "phototourism-data": (PhototourismDataParserConfig, Phototourism),
            "heritage-data": (HeritageDataParserConfig, Heritage),
            "instant-ngp-data": (InstantNGPDataParserConfig, InstantNGP),
            "dnerf-data": (DNeRFDataParserConfig, DNeRF),
            "record3d-data": (Record3DDataParserConfig, Record3D),
            "friends-data": (FriendsDataParserConfig, Friends),
        }
    )


def _print_help():
    print("usage: sst-train <method> [--<path> <value>]... [<dataparser> [--<path> <value>]...]")
    print("\nmethods:")
    for name in sorted(method_configs):
        print(f"  {name:22s} {descriptions.get(name, '')}")
    _register_dataparsers()
    print("\ndataparsers:", ", ".join(sorted(DATAPARSERS)))
    print("\ncommon flags: --data PATH  --experiment-name NAME  --output-dir DIR")
    print("  --vis {tensorboard,none}  --trainer.max-num-iterations N")
    print("  --pipeline.model.<field> V  --pipeline.datamanager.<field> V")


def _apply_override(config: Config, key: str, value: str) -> Config:
    key = key.lstrip("-")
    norm = key.replace("-", "_")
    # reference-compatible aliases
    if norm == "data":
        config.data = Path(value)
        return config
    if norm in ("experiment_name", "output_dir", "vis", "method_name", "timestamp"):
        setattr(config, norm, Path(value) if norm == "output_dir" else value)
        return config
    if norm == "seed":
        config.seed = int(value)
        return config
    for prefix, attr in (
        ("pipeline.model.", "model"),
        ("pipeline.datamanager.", "datamanager"),
        ("model.", "model"),
        ("datamanager.", "datamanager"),
        ("trainer.", "trainer"),
        ("machine.", "machine"),  # multi-host mesh (parallel/multihost.py)
    ):
        if norm.startswith(prefix.replace("-", "_")):
            rest = norm[len(prefix):]
            setattr(config, attr, override_nested(getattr(config, attr), rest, value))
            return config
    if norm.startswith("optimizers."):
        config.optimizers = override_nested(config.optimizers, norm[len("optimizers."):], value)
        return config
    raise ValueError(f"unknown flag --{key}")


def parse_args(argv) -> Config:
    _register_dataparsers()
    if not argv or argv[0] in ("-h", "--help"):
        _print_help()
        sys.exit(0)
    method = argv[0]
    config = get_method_config(method)
    i = 1
    # method-level overrides until a dataparser name appears
    while i < len(argv):
        tok = argv[i]
        if tok in DATAPARSERS:
            parser_cfg_cls, parser_cls = DATAPARSERS[tok]
            # keep the method's dataparser defaults when the type matches
            # (tyro subcommand semantics, method_configs.py:1165-1172)
            if not isinstance(config.dataparser, parser_cfg_cls):
                config.dataparser = parser_cfg_cls()
            config.dataparser_class = parser_cls
            i += 1
            while i < len(argv):
                key = argv[i].lstrip("-").replace("-", "_")
                value = argv[i + 1]
                if key == "data":
                    config.data = Path(value)
                else:
                    config.dataparser = override_nested(config.dataparser, key, value)
                i += 2
            break
        value = argv[i + 1]
        config = _apply_override(config, tok, value)
        i += 2
    return config


def main(config: Config):
    config.set_timestamp()
    from sdfstudio_tpu.parallel.multihost import maybe_initialize

    # join the multi-host job BEFORE the first backend use (the mesh in
    # Trainer then spans all processes' devices; reference train.py:93-116)
    maybe_initialize(config.machine)
    from sdfstudio_tpu.engine.setup import setup_trainer

    trainer = setup_trainer(config)
    import jax as _jax

    if _jax.process_index() == 0:
        config.save_config()
    import jax

    trainer.setup(jax.random.PRNGKey(config.seed))
    viewer = None
    if config.vis == "viewer":
        from sdfstudio_tpu.viewer.server import setup_viewer

        viewer = setup_viewer(trainer)
    trainer.train()
    print("training finished", flush=True)
    if viewer is not None:
        # keep serving the viewer after training (reference trainer keeps
        # the viewer alive post-train; ctrl+c to exit)
        print("viewer still running — ctrl+c to exit", flush=True)
        try:
            viewer.serve_idle()
        except KeyboardInterrupt:
            pass


SEGMENT_ENV = "SST_SEGMENT_CHILD"


def _tpu_backend_expected() -> bool:
    # SST_JAX_PLATFORM (utils/platform.py) outranks JAX_PLATFORMS: the
    # deployment's sitecustomize force-exports JAX_PLATFORMS=axon, so the
    # standard variable can't express "this child must stay on CPU"
    plat = os.environ.get("SST_JAX_PLATFORM") or os.environ.get("JAX_PLATFORMS", "")
    return plat not in ("", "cpu")


def run_segmented(argv, config: Config):
    """Segmented training for the TPU deployment: each segment runs in a
    fresh process whose ONLY hot executable is the train step (loading any
    second program — or doing any device->host fetch — permanently degrades
    step dispatch to ~5.8s; see docs/tpu-design.md). Checkpoint + eval
    happen at segment ends. NOTE: each segment end pays ~5-7 min (the
    process's first D2H fetch alone is ~330s), so keep steps_per_save LARGE
    on this deployment — training itself runs at ~300k+ steps/hour."""
    import subprocess

    config.set_timestamp()
    total = config.trainer.max_num_iterations
    segment = max(config.trainer.steps_per_save, 1)
    ckpt_dir = config.get_checkpoint_dir()
    # method-level flags must precede the dataparser subcommand token
    split = next((i for i, tok in enumerate(argv) if tok in DATAPARSERS), len(argv))
    head, tail = list(argv[:split]), list(argv[split:])
    # final-eval flags belong to the LAST segment only: an intermediate
    # child's max-num-iterations IS its segment end, so passing them through
    # would run the full protocol eval at every segment boundary
    head_mid = [
        tok
        for i, tok in enumerate(head)
        if not (
            tok.replace("_", "-").startswith("--trainer.final-eval")
            or (i > 0 and head[i - 1].replace("_", "-").startswith("--trainer.final-eval"))
        )
    ]
    start = 0
    while start < total:
        end = min(start + segment, total)
        extra = [
            "--timestamp", config.timestamp,
            "--trainer.max-num-iterations", str(end),
            "--trainer.defer-heavy-ops", "True",
        ]
        if start > 0:
            extra += ["--trainer.load-dir", str(ckpt_dir)]
        seg_head = head if end >= total else head_mid
        args = [sys.executable, "-m", "sdfstudio_tpu.scripts.train"] + seg_head + extra + tail
        print(f"[segments] steps {start} -> {end} of {total}", flush=True)
        env = dict(os.environ, **{SEGMENT_ENV: "1"})
        ret = subprocess.run(args, env=env).returncode
        if ret != 0:
            sys.exit(ret)
        start = end
    print("training finished (all segments)", flush=True)


def entrypoint():
    from sdfstudio_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    argv = sys.argv[1:]
    config = parse_args(argv)
    in_child = os.environ.get(SEGMENT_ENV) == "1"
    needs_segments = (
        _tpu_backend_expected()
        and not in_child
        and config.trainer.max_num_iterations > config.trainer.steps_per_save
    )
    if needs_segments:
        run_segmented(argv, config)
    else:
        main(config)


if __name__ == "__main__":
    entrypoint()
