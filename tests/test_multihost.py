"""Multi-host (multi-process) data parallelism.

The TPU-native replacement for the reference's multi-node DDP
(scripts/train.py:93-217, base_config.py:76-83): every process joins via
jax.distributed.initialize and runs the SAME jitted SPMD program over a
global Mesh. Here: 2 processes x 4 CPU devices (gloo collectives) must
reproduce 1 process x 8 CPU devices.
"""
import subprocess
import sys
from pathlib import Path

import pytest

from sdfstudio_tpu.data.synthetic import generate_sphere_dataset
from sdfstudio_tpu.parallel.multihost import MachineConfig, free_port, launch_local

CHILD = Path(__file__).parent / "multihost_child.py"


def _run_workers(nproc: int, devs: int, data_dir: Path, out_dir: Path) -> str:
    port = free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(CHILD), str(r), str(nproc), str(port), str(devs),
             str(data_dir), str(out_dir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return (out_dir / "checksum.txt").read_text()


@pytest.mark.slow
def test_2proc_matches_1proc(tmp_path):
    data = tmp_path / "sphere"
    generate_sphere_dataset(data, num_images=8, width=48, height=48)
    c1 = _run_workers(1, 8, data, tmp_path / "single")
    c2 = _run_workers(2, 4, data, tmp_path / "multi")
    v1, v2 = float(c1), float(c2)
    assert v1 == pytest.approx(v2, rel=1e-5), (v1, v2)


def test_machine_config_flags():
    from sdfstudio_tpu.scripts.train import parse_args

    cfg = parse_args(
        ["neus", "--machine.num-machines", "2", "--machine.machine-rank", "1",
         "--machine.dist-url", "h0:123"]
    )
    assert cfg.machine.num_machines == 2
    assert cfg.machine.machine_rank == 1
    assert cfg.machine.dist_url == "h0:123"


def test_launch_local_smoke(tmp_path):
    # launch_local drives two trivial children that just join the job
    script = tmp_path / "tiny.py"
    script.write_text(
        "import sys, os\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_cpu_collectives_implementation', 'gloo')\n"
        "i = sys.argv.index('--machine.machine-rank')\n"
        "rank = int(sys.argv[i + 1])\n"
        "url = sys.argv[sys.argv.index('--machine.dist-url') + 1]\n"
        "jax.distributed.initialize(url, num_processes=2, process_id=rank)\n"
        "assert jax.process_count() == 2\n"
        "print('joined', rank)\n"
    )
    results = launch_local(2, [str(script)], timeout=300)
    assert all("joined" in r.stdout for r in results)
