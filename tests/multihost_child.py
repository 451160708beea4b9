"""Worker process for the multi-host training test.

Run as: python multihost_child.py RANK NPROC PORT DEVICES_PER_PROC DATA_DIR OUT_DIR

Joins a gloo-backed multi-process CPU job (the rehearsal analog of a TPU
pod slice; reference multi-node DDP is scripts/train.py:93-217), trains the
tiny NeuS sphere fixture for a few steps over the GLOBAL mesh, and writes a
params checksum — the test asserts 2-process x 4-device matches
1-process x 8-device.
"""
import os
import sys

rank, nproc, port, devs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
data_dir, out_dir = sys.argv[5], sys.argv[6]

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags + f" --xla_force_host_platform_device_count={devs}").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
if nproc > 1:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=rank
    )

assert jax.process_count() == nproc, (jax.process_count(), nproc)
assert len(jax.devices()) == nproc * devs, (len(jax.devices()), nproc, devs)

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)  # tests/ for the fixture helpers
sys.path.insert(0, os.path.dirname(_here))  # repo root for sdfstudio_tpu
from test_train_e2e import build_trainer  # noqa: E402

import jax.numpy as jnp  # noqa: E402
from pathlib import Path  # noqa: E402

trainer = build_trainer(Path(data_dir), Path(out_dir) / f"rank{rank}", max_iters=6)
trainer.config.steps_per_save = 1000
trainer.config.steps_per_eval_image = 0
trainer.setup(jax.random.PRNGKey(0))
trainer.train(6)

leaves = jax.tree_util.tree_leaves(trainer.state.params)
checksum = float(sum(jnp.sum(jnp.abs(x.astype(jnp.float64) if x.dtype == jnp.float32 else x)) for x in leaves if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)))
print(f"RANK{rank} CHECKSUM {checksum:.10f}", flush=True)
if rank == 0:
    (Path(out_dir) / "checksum.txt").write_text(f"{checksum:.10f}")
