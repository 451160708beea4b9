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


def test_attested_preset_layout_pinned():
    """PARITY.json's validity depends on configs/methods.py matching the
    layout the attestation arm actually trained (round-5 stacked-capacity
    decision: L8xF4@512 + 128-wide MLP proposals, K=25). Drift here would
    silently benchmark a different config than the one attested."""
    cfg = method_configs["neus-facto-tpu"]
    sdf = cfg.model.sdf_field
    assert sdf.num_levels == 8
    assert sdf.hash_features_per_level == 4
    assert sdf.max_res == 512  # measured better than 2048 at 20k (r4 arms)
    assert sdf.log2_hashmap_size == 19
    for args in cfg.model.proposal_net_args_list:
        assert args["field_type"] == "mlp"
        assert args["hidden_dim"] == 128
    assert cfg.trainer.steps_per_call == 25
    p4 = method_configs["neus-facto-tpu-p4"]
    assert p4.model.sdf_field.encoding_type == "permuto"
    assert p4.model.sdf_field.max_res == 512
    # the round-5 attestation carrier (PARITY.json method): permuto L8xF4
    p8 = method_configs["neus-facto-tpu-p8"]
    assert p8.model.sdf_field.encoding_type == "permuto"
    assert p8.model.sdf_field.num_levels == 8
    assert p8.model.sdf_field.hash_features_per_level == 4
    assert p8.model.sdf_field.max_res == 512
    for args in p8.model.proposal_net_args_list:
        assert args["field_type"] == "mlp" and args["hidden_dim"] == 128
    assert p8.trainer.steps_per_call == 25
