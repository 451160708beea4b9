"""Probe-verified per-method scan-K table (``steps_per_call`` auto-resolution).

The trainer fuses K train steps into one dispatched ``lax.scan`` program to
amortize the per-dispatch relay round trip (engine/trainer.py). This TPU
stack's compiler faults on some methods above a program-size-dependent K
("TPU device error" on the full neus-facto step at K>=16, while the leaner
neus-facto-tpu preset verifies at K=25/40 — docs/tpu-design.md), so K
cannot be probed in-process (loading extra executables permanently degrades
the deployment's program cache) and must come from offline probing:

    python -m sdfstudio_tpu.scripts.benchmarking.probe_scan_k \
        --method <m> --record

writes the largest verified K here; ``setup_trainer`` consults the table
whenever ``TrainerConfig.steps_per_call`` is left at 0 (auto) on a TPU
backend. Methods absent from the table fall back to the conservative
global auto K (10).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict

TABLE_PATH = Path(__file__).with_name("safe_k.json")


def load_table() -> Dict[str, int]:
    if not TABLE_PATH.exists():
        return {}
    data = json.loads(TABLE_PATH.read_text())
    return {k: int(v) for k, v in data.items() if not k.startswith("_")}


def lookup(method_name: str) -> int:
    """Probe-verified K for a method, or 0 when never probed."""
    return load_table().get(method_name, 0)


def record(method_name: str, k: int) -> None:
    data = json.loads(TABLE_PATH.read_text()) if TABLE_PATH.exists() else {}
    data[method_name] = int(k)
    TABLE_PATH.write_text(json.dumps(data, indent=2, sort_keys=True) + "\n")
