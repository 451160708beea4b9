"""The real TPU dispatch path: K-step lax.scan windows and multi-device
steps must match single-step / single-device training exactly.

Every real TPU run dispatches K steps as one scanned program
(engine/trainer.py steps_per_call) and shards rays over the mesh
(parallel/mesh.py) — these tests pin both paths to the K=1 / 1-device
semantics the rest of the suite exercises.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdfstudio_tpu.parallel import mesh as mesh_lib
from tests.test_train_e2e import build_trainer, sphere_data  # noqa: F401


def _leaf_allclose(a, b, atol=0.0, rtol=0.0):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=rtol)


@pytest.mark.parametrize("k", [2, 5])
def test_multi_step_scan_equals_single_steps(sphere_data, tmp_path, k):
    """_train_multi(state, K) == K x _train_step(state): the scanned program
    splits the carried rng exactly like the single-step program, so params
    after a scan window must match K individual steps."""
    t_a = build_trainer(sphere_data, tmp_path / "a", max_iters=k)
    t_a.setup(jax.random.PRNGKey(7))
    t_b = build_trainer(sphere_data, tmp_path / "b", max_iters=k)
    t_b.setup(jax.random.PRNGKey(7))

    state_a = t_a.state
    singles = []
    for _ in range(k):
        state_a, m = t_a._train_step(state_a)
        singles.append(m)

    state_b, mstack = t_b._train_multi(t_b.state, k)

    assert int(state_a.step) == int(state_b.step) == k
    # same program semantics, different XLA programs -> float32-tight, not
    # necessarily bit-equal
    _leaf_allclose(state_a.params, state_b.params, atol=1e-5, rtol=1e-4)
    # per-step metrics line up too
    np.testing.assert_allclose(
        np.asarray(mstack[-1]), np.asarray(singles[-1]), atol=1e-4, rtol=1e-3
    )


def test_8dev_step_equals_1dev_step(sphere_data, tmp_path):
    """A step on the 8-device CPU mesh must match the same step on a
    1-device mesh (ray sharding + XLA all-reduce vs local reduction)."""
    devices = jax.devices()
    assert len(devices) >= 8, "conftest forces an 8-device CPU topology"

    t1 = build_trainer(sphere_data, tmp_path / "d1", max_iters=3)
    t1.mesh = mesh_lib.create_mesh(devices[:1])
    t1.setup(jax.random.PRNGKey(3))
    t8 = build_trainer(sphere_data, tmp_path / "d8", max_iters=3)
    t8.mesh = mesh_lib.create_mesh(devices)
    t8.setup(jax.random.PRNGKey(3))

    s1, s8 = t1.state, t8.state
    for _ in range(3):
        s1, m1 = t1._train_step(s1)
        s8, m8 = t8._train_step(s8)

    _leaf_allclose(s1.params, s8.params, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m8), atol=1e-4, rtol=1e-3)


def test_train_loop_uses_scan_windows(sphere_data, tmp_path):
    """trainer.train() with steps_per_call=3 reaches max_iters and produces
    finite params through the _train_multi path."""
    trainer = build_trainer(sphere_data, tmp_path / "run", max_iters=7)
    trainer.config = dataclasses.replace(
        trainer.config, steps_per_call=3, steps_per_log=3
    )
    trainer.setup(jax.random.PRNGKey(0))
    state = trainer.train()
    assert int(state.step) == 7
    assert all(
        bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(state.params)
    )


def test_scan_window_exceeds_log_cadence(sphere_data, tmp_path, monkeypatch):
    """steps_per_call > steps_per_log must NOT be clamped down: the loop
    logs once per K-window instead (a silent min(K, steps_per_log) clamp
    previously defeated neus-facto-tpu's verified steps_per_call=25)."""
    trainer = build_trainer(sphere_data, tmp_path / "run", max_iters=10)
    trainer.config = dataclasses.replace(
        trainer.config, steps_per_call=5, steps_per_log=2
    )
    trainer.setup(jax.random.PRNGKey(0))
    seen_k = []
    orig = trainer._train_multi
    monkeypatch.setattr(
        trainer, "_train_multi",
        lambda state, k: seen_k.append(k) or orig(state, k),
    )
    state = trainer.train()
    assert int(state.step) == 10
    assert seen_k == [5, 5]
    # per-group lr telemetry lands in the writer (reference optimizers.py:160)
    lr_keys = [k for k in trainer.writer.buffers if k.startswith("learning_rate/")]
    assert lr_keys, "expected learning_rate/<group> scalars at log steps"


def test_interrupt_checkpoints_at_completed_step(sphere_data, tmp_path, monkeypatch):
    """ctrl+c mid-run flushes + checkpoints at the last completed window
    instead of losing the segment (reference train.py:207-215 clean-exit
    semantics)."""
    trainer = build_trainer(sphere_data, tmp_path / "run", max_iters=20)
    trainer.config = dataclasses.replace(
        trainer.config, steps_per_call=5, steps_per_log=5, steps_per_save=1000
    )
    trainer.setup(jax.random.PRNGKey(0))
    orig = trainer._train_multi
    calls = []

    def interrupt_on_second(state, k):
        if calls:
            raise KeyboardInterrupt
        calls.append(k)
        return orig(state, k)

    monkeypatch.setattr(trainer, "_train_multi", interrupt_on_second)
    trainer.train()
    # one 5-step window completed before the interrupt
    ckpts = sorted(p.name for p in (tmp_path / "run" / "sdfstudio_models").glob("step-*"))
    assert ckpts == ["step-000000005"]
    """Mono-depth SSI loss must handle ray batches not divisible by 32
    (the reference hard-reshapes to (1, 32, -1): base_surface_model.py:433).
    Padded-mask grouping must (a) run at R=100, (b) equal the unpadded loss
    when padding is pure masked zeros."""
    import dataclasses as dc

    from sdfstudio_tpu.components import losses as L

    # unit check: masked zero-padding does not change the loss
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.rand(64).astype(np.float32))
    gt = jnp.asarray(rng.rand(64).astype(np.float32))
    base = L.scale_and_shift_invariant_loss(
        pred.reshape(1, 32, -1), gt.reshape(1, 32, -1),
        jnp.ones((1, 32, 2)), alpha=0.5, scales=1,
    )
    # masked zero-columns appended to each row: same adjacency for the
    # gradient term, so the loss must be identical
    pad_pred = jnp.pad(pred.reshape(1, 32, 2), ((0, 0), (0, 0), (0, 1)))
    pad_gt = jnp.pad(gt.reshape(1, 32, 2), ((0, 0), (0, 0), (0, 1)))
    pad_mask = jnp.pad(jnp.ones((1, 32, 2)), ((0, 0), (0, 0), (0, 1)))
    padded = L.scale_and_shift_invariant_loss(
        pad_pred, pad_gt, pad_mask, alpha=0.5, scales=1
    )
    np.testing.assert_allclose(np.asarray(padded), np.asarray(base), rtol=1e-5)

    # e2e: a 100-ray batch (not divisible by 32) trains with the depth loss on
    trainer = build_trainer(sphere_data, tmp_path / "run", max_iters=2)
    trainer.datamanager.config = dc.replace(
        trainer.datamanager.config, train_num_rays_per_batch=100
    )
    trainer.model.config = dc.replace(trainer.model.config, mono_depth_loss_mult=0.05)
    trainer.setup(jax.random.PRNGKey(0))
    trainer.state, metrics = trainer._train_step(trainer.state)
    vals = trainer.unpack_metrics(metrics)
    assert "depth_loss" in vals and np.isfinite(vals["depth_loss"])


@pytest.mark.slow
def test_fullsize_sharded_compile():
    """The FULL deployment-scale step (2048 rays, 2^19 tables) must
    partition and compile over the 8-device mesh — not just the tiny
    dryrun shapes (AOT compile only; execution would be CPU-minutes)."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8, full_size=True)
