"""Top-level experiment configuration.

Functional spec: reference nerfstudio/configs/base_config.py:59-282 —
dataclass config tree, timestamped output dirs, YAML save/load. Instead of
the `_target` + setup() pattern, method entries in
:mod:`sdfstudio_tpu.configs.methods` carry the model class directly and
``setup_pipeline`` builds dataparser -> datamanager -> model -> trainer.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional, Type

from sdfstudio_tpu.data.datamanager import DataManagerConfig
from sdfstudio_tpu.data.dataparsers.base import DataParserConfig
from sdfstudio_tpu.engine.optimizers import OptimizerGroupConfig
from sdfstudio_tpu.engine.trainer import TrainerConfig
from sdfstudio_tpu.parallel.multihost import MachineConfig

# repo root: configs/base.py -> sdfstudio_tpu -> repo
_REPO_ROOT = Path(__file__).resolve().parents[2]


def _machine_config() -> MachineConfig:
    return MachineConfig()


@dataclass
class Config:
    """Full experiment config (reference base_config.py:201-282)."""

    method_name: str = "neus"
    experiment_name: str = "experiment"
    timestamp: str = "{timestamp}"
    output_dir: Path = Path("outputs")
    vis: str = "tensorboard"  # tensorboard | wandb | viewer | none
    machine: "MachineConfig" = field(default_factory=lambda: _machine_config())
    data: Optional[Path] = None
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    datamanager: DataManagerConfig = field(default_factory=DataManagerConfig)
    model: Any = None  # a *ModelConfig dataclass
    model_class: Optional[Type] = None
    dataparser: Any = None  # a *DataParserConfig dataclass
    dataparser_class: Optional[Type] = None
    optimizers: Dict[str, OptimizerGroupConfig] = field(default_factory=dict)
    seed: int = 42
    enable_profiler: bool = False
    """Wall-clock section profiler table at exit (reference
    LoggingConfig.enable_profiler, base_config.py:127). NOTE: on remote-TPU
    relays wall-clock sections measure dispatch, not device time — see
    docs/tpu-design.md."""
    matmul_precision: str = "high"
    """TPU matmul precision: default (bf16) | high (bf16_3x ~ f32) | highest
    (f32). Surface methods train in f32 in the reference
    (method_configs.py mixed_precision=False everywhere)."""

    def get_base_dir(self) -> Path:
        return Path(self.output_dir) / self.experiment_name / self.method_name / self.timestamp

    def get_checkpoint_dir(self) -> Path:
        return self.get_base_dir() / "sdfstudio_models"

    def set_timestamp(self):
        import datetime

        if self.timestamp == "{timestamp}":
            self.timestamp = datetime.datetime.now().strftime("%Y-%m-%d_%H%M%S")

    # -- serialization -------------------------------------------------
    def to_dict(self) -> Dict:
        def ser(obj):
            if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
                d = {"__dataclass__": type(obj).__module__ + ":" + type(obj).__qualname__}
                for f in dataclasses.fields(obj):
                    d[f.name] = ser(getattr(obj, f.name))
                return d
            if isinstance(obj, Path):
                # store repo-relative so checkpoints survive checkouts
                # mounted somewhere other than the original absolute path
                try:
                    rel = Path(obj).resolve().relative_to(_REPO_ROOT)
                    return {"__path__": str(rel)}
                except ValueError:
                    return {"__path__": str(obj)}
            if isinstance(obj, dict):
                return {k: ser(v) for k, v in obj.items()}
            if isinstance(obj, (list, tuple)):
                return [ser(v) for v in obj]
            if isinstance(obj, type):
                return {"__class__": obj.__module__ + ":" + obj.__qualname__}
            return obj

        return ser(self)

    @staticmethod
    def from_dict(data: Dict) -> "Config":
        import importlib

        def resolve(spec: str):
            mod, qual = spec.split(":")
            obj = importlib.import_module(mod)
            for part in qual.split("."):
                obj = getattr(obj, part)
            return obj

        def de(obj):
            if isinstance(obj, dict):
                if "__dataclass__" in obj:
                    cls = resolve(obj["__dataclass__"])
                    kwargs = {k: de(v) for k, v in obj.items() if k != "__dataclass__"}
                    # tolerate removed/renamed fields
                    names = {f.name for f in dataclasses.fields(cls)}
                    return cls(**{k: v for k, v in kwargs.items() if k in names})
                if "__path__" in obj:
                    p = Path(obj["__path__"])
                    # relative paths are repo-relative (see to_dict)
                    return p if p.is_absolute() else _REPO_ROOT / p
                if "__class__" in obj:
                    return resolve(obj["__class__"])
                return {k: de(v) for k, v in obj.items()}
            if isinstance(obj, list):
                return [de(v) for v in obj]
            return obj

        return de(data)

    def save_config(self):
        """Write config.yml to the base dir (reference base_config.py:269-282)."""
        import yaml

        base = self.get_base_dir()
        base.mkdir(parents=True, exist_ok=True)
        (base / "config.yml").write_text(yaml.safe_dump(self.to_dict(), sort_keys=False))

    @staticmethod
    def load_config(path: Path) -> "Config":
        import yaml

        return Config.from_dict(yaml.safe_load(Path(path).read_text()))


def override_nested(obj: Any, dotted_path: str, raw_value: str):
    """Apply a ``--a.b.c value`` CLI override onto a (possibly frozen)
    nested dataclass tree (the tyro-equivalent surface, scripts/train.py:251)."""
    parts = dotted_path.replace("-", "_").split(".")

    def convert(current, raw: str):
        if isinstance(current, bool):
            return raw.lower() in ("true", "1", "yes")
        if isinstance(current, int) and not isinstance(current, bool):
            return int(raw)
        if isinstance(current, float):
            return float(raw)
        if isinstance(current, Path):
            return Path(raw)
        if isinstance(current, tuple):
            vals = [v for v in raw.replace("(", "").replace(")", "").split(",") if v]
            elem = current[0] if current else 0
            return tuple(type(elem)(v) for v in vals)
        if current is None:
            # best-effort literal parse
            for cast in (int, float):
                try:
                    return cast(raw)
                except ValueError:
                    pass
            if raw.lower() in ("true", "false"):
                return raw.lower() == "true"
            return raw
        return type(current)(raw)

    def rec(o, parts):
        name = parts[0]
        if isinstance(o, dict):
            sub = o[name]
            new = convert(sub, raw_value) if len(parts) == 1 else rec(sub, parts[1:])
            out = dict(o)
            out[name] = new
            return out
        current = getattr(o, name)
        new = convert(current, raw_value) if len(parts) == 1 else rec(current, parts[1:])
        return dataclasses.replace(o, **{name: new})

    return rec(obj, parts)
