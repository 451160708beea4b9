r"""Multi-host (multi-process) training support.

Functional spec: reference scripts/train.py:93-217 (``launch`` /
``_distributed_worker``: multi-machine DDP over ``dist_url`` with
world_size = num_machines * num_gpus) and base_config.py:76-83
(MachineConfig). TPU-native redesign: no NCCL process groups, no DDP
module wrapper, no mp.spawn fan-out of ranks per machine — each host runs
ONE process that calls :func:`jax.distributed.initialize`, and every host
executes the SAME jitted SPMD program over a global
:class:`jax.sharding.Mesh`. XLA inserts the gradient all-reduce over
ICI/DCN; there is no hand-written gradient averaging (reference
base_pipeline.py:242 wraps the model in DDP instead).

Launch model (mirrors a TPU pod slice):

    # host 0                                  # host 1
    sst-train ... --machine.num-machines 2 \
        --machine.machine-rank 0 \            --machine.machine-rank 1 \
        --machine.dist-url host0:8476         --machine.dist-url host0:8476

Single-machine multi-process (tests / CPU-mesh validation) uses
:func:`launch_local`, which spawns N identical child processes on
localhost — the analog of the reference's ``mp.spawn`` path
(scripts/train.py:120-142).
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys
from dataclasses import dataclass
from typing import List, Optional, Sequence

_DEFAULT_PORT = 8476  # reference uses an auto-chosen free port (train.py:226)


@dataclass
class MachineConfig:
    """Mirror of reference MachineConfig (base_config.py:76-83).

    ``num_devices_per_machine`` exists for CPU-mesh validation only: it sets
    ``--xla_force_host_platform_device_count`` so an N-process M-device run
    can be rehearsed on one box without TPUs.
    """

    num_machines: int = 1
    machine_rank: int = 0
    dist_url: str = "auto"
    num_devices_per_machine: int = 0  # 0 = whatever the platform exposes
    seed: int = 42


def _resolve_url(cfg: MachineConfig) -> str:
    if cfg.dist_url and cfg.dist_url != "auto":
        return cfg.dist_url
    return os.environ.get("SST_COORDINATOR", f"localhost:{_DEFAULT_PORT}")


def maybe_initialize(cfg: Optional[MachineConfig]) -> None:
    """Join the multi-process job if configured. Must run before the first
    use of the jax backend (like torch.distributed.init_process_group in
    reference train.py:93-116, but once per host, not once per GPU)."""
    if cfg is None or cfg.num_machines <= 1:
        return
    if cfg.num_devices_per_machine:
        flags = os.environ.get("XLA_FLAGS", "")
        want = f"--xla_force_host_platform_device_count={cfg.num_devices_per_machine}"
        if want not in flags:
            os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
    import jax

    if jax.process_count() > 1:  # already initialized
        return
    jax.distributed.initialize(
        coordinator_address=_resolve_url(cfg),
        num_processes=cfg.num_machines,
        process_id=cfg.machine_rank,
    )


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def launch_local(
    num_processes: int,
    argv: Sequence[str],
    *,
    python: Optional[str] = None,
    env: Optional[dict] = None,
    timeout: float = 600.0,
) -> List[subprocess.CompletedProcess]:
    """Spawn ``num_processes`` identical local workers (reference mp.spawn
    analog, scripts/train.py:120-142). Each child gets
    ``--machine.num-machines/--machine.machine-rank/--machine.dist-url``
    appended to ``argv``. Blocks until all exit; raises on any failure."""
    url = f"localhost:{free_port()}"
    procs = []
    for rank in range(num_processes):
        args = [python or sys.executable] + list(argv) + [
            "--machine.num-machines", str(num_processes),
            "--machine.machine-rank", str(rank),
            "--machine.dist-url", url,
        ]
        procs.append(
            subprocess.Popen(
                args,
                env={**os.environ, **(env or {})},
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    done = []
    failed = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            failed.append((rank, "timeout", out))
            continue
        done.append(subprocess.CompletedProcess(p.args, p.returncode, out, None))
        if p.returncode != 0:
            failed.append((rank, p.returncode, out))
    if failed:
        msgs = "\n".join(f"--- rank {r} ({rc}):\n{out[-4000:]}" for r, rc, out in failed)
        raise RuntimeError(f"{len(failed)} worker(s) failed:\n{msgs}")
    return done
