"""Config YAML round-trip: paths under the repo root are serialized
repo-relative so checkpoints survive checkouts mounted elsewhere
(advisor finding r2; reference base_config.py:269-282 stores absolute
paths and breaks on moved checkouts — we deliberately do better)."""
import dataclasses
from pathlib import Path

import yaml

from sdfstudio_tpu.configs.base import _REPO_ROOT, Config
from sdfstudio_tpu.configs.methods import method_configs


def _roundtrip(cfg: Config) -> Config:
    return Config.from_dict(yaml.safe_load(yaml.safe_dump(cfg.to_dict(), sort_keys=False)))


def test_repo_internal_paths_serialize_relative():
    cfg = method_configs["neus"]
    cfg = dataclasses.replace(
        cfg,
        output_dir=_REPO_ROOT / ".parity" / "runs",
        data=_REPO_ROOT / ".parity" / "dtu_like",
    )
    d = cfg.to_dict()
    assert d["output_dir"]["__path__"] == ".parity/runs"  # no absolute prefix
    back = _roundtrip(cfg)
    # resolves against the repo root regardless of cwd
    assert Path(back.output_dir) == _REPO_ROOT / ".parity" / "runs"
    assert Path(back.data) == _REPO_ROOT / ".parity" / "dtu_like"


def test_external_paths_stay_absolute():
    cfg = method_configs["neus"]
    cfg = dataclasses.replace(cfg, output_dir=Path("/tmp/somewhere/out"))
    back = _roundtrip(cfg)
    assert Path(back.output_dir) == Path("/tmp/somewhere/out")
