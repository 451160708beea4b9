"""sst-eval: compute average eval-image metrics from a trained checkpoint.

Functional spec: reference scripts/eval.py:37-80 (eval_setup ->
get_average_eval_image_metrics -> write json).
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def main(load_config: Path, output_path: Path):
    from sdfstudio_tpu.engine.setup import eval_setup

    config, trainer = eval_setup(load_config)
    n = trainer.datamanager.num_eval_images
    metrics = []
    t0 = time.time()
    for i in range(n):
        m = trainer.eval_image_metrics(i)
        metrics.append(m)
        print(f"image {i}: psnr={m['psnr']:.2f} ssim={m['ssim']:.4f}", flush=True)
    avg = {k: float(np.mean([m[k] for m in metrics])) for k in metrics[0]}
    dt = time.time() - t0
    result = {
        "experiment_name": config.experiment_name,
        "method_name": config.method_name,
        "checkpoint": str(config.get_checkpoint_dir()),
        "results": avg,
        "num_images": n,
        "seconds": dt,
    }
    output_path.parent.mkdir(parents=True, exist_ok=True)
    output_path.write_text(json.dumps(result, indent=2))
    print(json.dumps(avg))


def entrypoint():
    from sdfstudio_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--load-config", type=Path, required=True)
    p.add_argument("--output-path", type=Path, default=Path("output.json"))
    a = p.parse_args()
    main(a.load_config, a.output_path)


if __name__ == "__main__":
    entrypoint()
