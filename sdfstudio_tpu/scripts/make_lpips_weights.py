"""Generate a DETERMINISTIC, NON-CANONICAL LPIPS weights file.

The reference reports LPIPS(VGG) on every eval
(reference nerfstudio/models/base_surface_model.py:233-236) using
torchmetrics' pretrained VGG16 + trained linear heads. Those weights
cannot be obtained in a zero-egress deployment, so this tool builds the
closest honest substitute: a VGG16 conv stack with He-initialized
weights from a FIXED seed and uniform (1/C) linear heads.

Random-feature VGG distances are a known reasonable perceptual proxy —
Zhang et al. 2018 ("The Unreasonable Effectiveness of Deep Features...")
report that even randomly-initialized nets outperform pixel metrics on
their perceptual-judgment benchmarks — but this is NOT the published
LPIPS metric: numbers are comparable only to other numbers produced by
this same file. The .npz is stamped ``canonical=0`` and every consumer
(utils/metrics.lpips_metric_name) reports the column as ``lpips_rand``,
never ``lpips``.

Usage:
    python -m sdfstudio_tpu.scripts.make_lpips_weights out.npz [--seed 0]
    SST_LPIPS_WEIGHTS=out.npz sst-eval ...   # adds an "lpips_rand" column
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from sdfstudio_tpu.utils.metrics import _VGG16_PLAN


def make_weights(seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    out: dict = {"canonical": np.int32(0), "seed": np.int32(seed)}
    cin = 3
    stage_cout = {}
    for i, (cout, stage) in enumerate(_VGG16_PLAN):
        fan_in = 3 * 3 * cin
        out[f"conv{i}_w"] = rng.normal(
            0.0, np.sqrt(2.0 / fan_in), size=(3, 3, cin, cout)
        ).astype(np.float32)
        out[f"conv{i}_b"] = np.zeros(cout, np.float32)
        stage_cout[stage] = cout
        cin = cout
    for s in range(5):
        c = stage_cout[s]
        out[f"lin{s}"] = np.full(c, 1.0 / c, np.float32)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", type=Path)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    weights = make_weights(args.seed)
    args.out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(args.out, **weights)
    n_params = sum(v.size for v in weights.values())
    print(f"wrote {args.out} ({n_params:,} params, seed={args.seed}, "
          f"canonical=0 -> metric column 'lpips_rand')")


if __name__ == "__main__":
    main()
