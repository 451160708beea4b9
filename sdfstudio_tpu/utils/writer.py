"""Metrics / logging writers.

Functional spec: reference nerfstudio/utils/writer.py:38-476 — a global
event queue with pluggable backends (local rich terminal, tensorboard,
wandb), running averages and ETA. Simplified single-process version;
tensorboard via tensorboardX when available.
"""
from __future__ import annotations

import time
from collections import defaultdict, deque
from pathlib import Path
from typing import Dict, Optional

import numpy as np

# event names (reference writer.py:43-54)
ITER_TRAIN_TIME = "Train Iter (time)"
TRAIN_RAYS_PER_SEC = "Train Rays / Sec"
TEST_RAYS_PER_SEC = "Test Rays / Sec"
ETA = "ETA (time)"


class Writer:
    """Scalar/image writer with running averages + ETA."""

    def __init__(
        self,
        log_dir: Optional[Path] = None,
        use_tensorboard: bool = False,
        max_buffer_size: int = 20,
        banner: str = "",
        use_wandb: bool = False,
        wandb_project: str = "sdfstudio-tpu",
        experiment_name: str = "",
    ):
        self.log_dir = Path(log_dir) if log_dir else None
        self.buffers = defaultdict(lambda: deque(maxlen=max_buffer_size))
        self.tb = None
        self.wandb = None
        # non-main processes keep running averages (for ETA prints) but
        # emit no backend events (reference writer is rank-0 only via
        # comms.is_main_process gating in train.py:180-186)
        self._emit = _is_main_process()
        if use_tensorboard and self.log_dir is not None and self._emit:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(str(self.log_dir))
            except Exception:
                self.tb = None
        if use_wandb and self._emit:
            try:
                import wandb

                self.wandb = wandb
                wandb.init(
                    project=wandb_project,
                    name=experiment_name or None,
                    dir=str(self.log_dir) if self.log_dir else None,
                )
            except Exception:
                # wandb isn't installed in hermetic environments; the
                # reference hard-depends on it (utils/writer.py:191)
                self.wandb = None
        self.start_time = time.time()
        if banner:
            print(banner)

    def put_scalar(self, name: str, value: float, step: int):
        self.buffers[name].append(float(value))
        if self.tb is not None:
            self.tb.add_scalar(name, float(value), step)
        if self.wandb is not None:
            self.wandb.log({name: float(value)}, step=step)

    def put_dict(self, values: Dict[str, float], step: int, prefix: str = ""):
        for k, v in values.items():
            try:
                self.put_scalar(prefix + k, float(v), step)
            except (TypeError, ValueError):
                pass

    def put_image(self, name: str, image: np.ndarray, step: int):
        """image: [H, W, 3] float in [0,1]."""
        if not self._emit:
            return
        if self.tb is not None:
            self.tb.add_image(name, np.clip(image, 0, 1), step, dataformats="HWC")
        if self.wandb is not None:
            self.wandb.log(
                {name: self.wandb.Image(np.clip(image, 0, 1))}, step=step
            )
        if self.log_dir is not None:
            try:
                import imageio.v2 as imageio

                out = self.log_dir / "images"
                out.mkdir(parents=True, exist_ok=True)
                imageio.imwrite(
                    out / f"{name.replace('/', '_')}_{step:09d}.png",
                    (np.clip(image, 0, 1) * 255).astype(np.uint8),
                )
            except Exception:
                pass

    def avg(self, name: str) -> float:
        buf = self.buffers.get(name)
        return float(np.mean(buf)) if buf else 0.0

    def eta(self, step: int, max_steps: int) -> str:
        it_time = self.avg(ITER_TRAIN_TIME)
        remain = it_time * (max_steps - step)
        return time.strftime("%H:%M:%S", time.gmtime(remain))

    def print_row(self, step: int, max_steps: int, metrics: Dict[str, float]):
        parts = [f"step {step}/{max_steps}"]
        for k, v in metrics.items():
            parts.append(f"{k}={v:.4g}")
        rps = self.avg(TRAIN_RAYS_PER_SEC)
        if rps:
            parts.append(f"rays/s={rps:,.0f}")
        parts.append(f"eta={self.eta(step, max_steps)}")
        print("  ".join(parts), flush=True)

    def close(self):
        if self.tb is not None:
            self.tb.close()
        if self.wandb is not None:
            self.wandb.finish()


def _is_main_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True
