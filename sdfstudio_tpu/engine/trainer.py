"""Trainer: one jitted train step over a device mesh + host-side loop.

Functional spec: reference nerfstudio/engine/trainer.py:52-364 (train loop,
eval cadences, checkpoint save/load) — redesigned so the entire hot path
(pixel sampling -> ray generation -> model forward -> losses -> grads ->
optimizer update) is ONE XLA program with the ray batch sharded across the
mesh's data axis (replacing DDP, base_pipeline.py:242). Python only ticks
the loop, logs, evals, and checkpoints.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from sdfstudio_tpu.data.datamanager import VanillaDataManager
from sdfstudio_tpu.engine.optimizers import (
    OptimizerGroupConfig,
    build_optimizer,
    learning_rates_at,
)
from sdfstudio_tpu.parallel import mesh as mesh_lib
from sdfstudio_tpu.utils import profiler
from sdfstudio_tpu.utils import writer as writer_lib
from sdfstudio_tpu.utils.metrics import psnr as psnr_fn, ssim as ssim_fn


@dataclasses.dataclass
class TrainerConfig:
    """Mirror of reference TrainerConfig (configs/base_config.py:134-166)."""

    steps_per_save: int = 1000
    steps_per_eval_batch: int = 500
    steps_per_eval_image: int = 500
    steps_per_eval_all_images: int = 1000000
    max_num_iterations: int = 1000000
    steps_per_log: int = 10
    mixed_precision: bool = False
    save_only_latest_checkpoint: bool = True
    load_dir: Optional[Path] = None
    load_step: Optional[int] = None
    accumulate_grad_steps: int = 1
    """Gradient accumulation: grads averaged over N sub-batches per update
    via lax.scan (reference trainer.py:317-321)."""
    defer_heavy_ops: bool = False
    """When True (set automatically for segmented TPU runs): skip mid-run
    eval-image renders — loading ANY second executable permanently degrades
    every subsequent train step to ~5.8s on this deployment — and instead
    checkpoint + eval once at the end of the run/segment."""
    dynamic_batch: bool = False
    """Adapt rays/batch to a sample budget (reference
    pipelines/dynamic_batch.py:62-87). TPU redesign: the reference changes
    the ray count continuously, which would retrace the XLA program every
    step; here the ray count moves across POWER-OF-TWO buckets, each bucket
    a separately-compiled program (compiled lazily, cached). The measured
    samples-per-batch comes from the packed metrics vector the loop already
    buffers; on relay deployments (defer_heavy_ops) mid-run fetches poison
    the program cache, so the bucket is chosen once per segment from the
    previous segment's stats (dynamic_batch.txt in the checkpoint dir)."""
    target_num_samples: int = 1 << 18
    """Sample budget per batch (reference dynamic_batch.py:34)."""
    dynamic_update_every: int = 50
    """Steps between bucket re-evaluations (non-relay deployments)."""
    steps_per_call: int = 0
    """Train steps fused into ONE jitted program via lax.scan. Remote-TPU
    deployments pay a per-dispatch round trip (measured >1s through the axon
    relay — 2000 dispatched steps took >48 min while block_until_ready
    claimed ~1ms/step); scanning K steps per call amortizes it K-fold.
    0 = auto: setup_trainer consults the probe-verified per-method table
    (engine/safe_k.json) on TPU backends, else 10 on TPU / 1 on CPU.
    K>~16 faults this TPU stack's compiler on the full neus-facto step
    ("TPU device error" on scan-25/100; scan-5/10/16 fine). An in-process
    startup auto-probe is deliberately NOT done: probing would load extra
    executables into the device program cache, which permanently degrades
    every subsequent train step on this deployment (docs/tpu-design.md) —
    probe offline with scripts/benchmarking/probe_scan_k.py --record."""
    final_eval_gt: str = ""
    """When set ('dtu-like' | 'sphere' | 'heritage-like'), run the full
    protocol evaluation (eval-split PSNR/SSIM + marching-cubes Chamfer-L1
    vs the analytic GT) IN-PROCESS after the final checkpoint of a run that
    reached max_num_iterations. On the relay deployment this replaces
    separate eval subprocesses, each of which pays ~16 min of fixed startup
    plus per-chunk program-cache degradation (engine/final_eval.py)."""
    final_eval_output: str = ""
    """JSON path for the final-eval record (parity-metrics schema)."""
    final_eval_resolution: int = 256
    """Marching-cubes grid resolution for the final geometry eval."""
    final_eval_mesh: str = ""
    """Optional .ply path for the extracted final-eval mesh."""
    final_eval_max_images: int = 0
    """0 = evaluate every eval-split image; N = an even spread of N images
    (shootout arms use a subset — relative comparison, cheaper)."""


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar
    params: Any
    opt_state: Any
    model_state: Any = None  # e.g. occupancy grids (instant-ngp / neus-acc)
    rng: Any = None  # PRNG key, split INSIDE the jitted step (see below)


class Trainer:
    """Owns the jitted step, eval renderer, writer, and checkpoints."""

    def __init__(
        self,
        config: TrainerConfig,
        model,
        datamanager: VanillaDataManager,
        optimizer_groups: Dict[str, OptimizerGroupConfig],
        base_dir: Path,
        writer: Optional[writer_lib.Writer] = None,
        mesh=None,
    ):
        self.config = config
        self.model = model
        self.datamanager = datamanager
        self.optimizer_groups = optimizer_groups
        self.base_dir = Path(base_dir)
        self.ckpt_dir = self.base_dir / "sdfstudio_models"
        self.writer = writer or writer_lib.Writer(self.base_dir)
        self.mesh = mesh if mesh is not None else mesh_lib.create_mesh()
        self.state: Optional[TrainState] = None
        self._jit_train_step = None
        self._render_chunk = None
        # host-side mirror of state.step: reading int(state.step) is a
        # device->host fetch, which poisons the program cache (docs/tpu-design.md)
        self._host_step: Optional[int] = None
        # set by viewer.setup_viewer; the train loop services render
        # requests between steps (cross-thread JAX dispatch deadlocks)
        self.viewer_state = None

    # ------------------------------------------------------------------
    def setup(self, rng: Optional[jax.Array] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(42)
        k_model, k_cam = jax.random.split(rng)
        params = self.model.init(k_model)
        if self.datamanager.config.camera_optimizer.mode != "off":
            params["camera_opt"] = self.datamanager.init_camera_opt(k_cam)
        # strip weak types: init leaves created from python scalars are
        # weak-typed and become strong after the first optimizer update,
        # which would silently recompile the train step (minutes on TPU)
        params = jax.tree_util.tree_map(
            lambda x: jax.lax.convert_element_type(x, x.dtype), params
        )
        self.tx = build_optimizer(self.optimizer_groups, params)
        opt_state = self.tx.init(params)
        model_state = (
            self.model.init_model_state()
            if hasattr(self.model, "init_model_state")
            else None
        )
        # place the initial state with the mesh's replicated sharding so the
        # FIRST train-step compile already sees the steady-state shardings
        # (otherwise the second step recompiles — minutes on TPU).
        # put_replicated also handles multi-process meshes, where plain
        # device_put cannot target non-addressable devices (parallel/multihost.py)
        self.state = TrainState(
            step=mesh_lib.put_replicated(jnp.asarray(0, jnp.int32), self.mesh),
            params=mesh_lib.put_replicated(params, self.mesh),
            opt_state=mesh_lib.put_replicated(opt_state, self.mesh),
            model_state=(
                mesh_lib.put_replicated(model_state, self.mesh)
                if model_state is not None
                else None
            ),
            rng=mesh_lib.put_replicated(jax.random.fold_in(rng, 977), self.mesh),
        )
        # dataset tensors + cameras feed the global-mesh jit as arguments;
        # multi-process they must be global (replicated) arrays
        if jax.process_count() > 1:
            self.datamanager.commit(self.mesh)
            self.datamanager.train_cameras = mesh_lib.put_replicated(
                self.datamanager.train_cameras, self.mesh
            )
        self._host_step = 0
        if self.config.load_dir is not None:
            self._load_checkpoint(Path(self.config.load_dir), self.config.load_step)

        # dataset tensors and cameras are jit ARGUMENTS (not closures): the
        # image stack is tens of MB and would otherwise be inlined into the
        # HLO as constants
        self._jit_train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._jit_multi_step = jax.jit(
            self._multi_step_impl, static_argnums=(3,), donate_argnums=(0,)
        )
        self._render_chunk = jax.jit(self._render_chunk_impl)
        # dynamic batch: per-bucket compiled steps (see TrainerConfig)
        self._bucket_steps: Dict[int, Any] = {}
        self._dyn_num_rays: Optional[int] = None
        if self.config.dynamic_batch:
            self._dyn_num_rays = self._initial_bucket()
        return self.state

    # -- dynamic batch (reference pipelines/dynamic_batch.py) ----------
    def _initial_bucket(self) -> int:
        saved = self.ckpt_dir / "dynamic_batch.txt"
        if saved.exists():
            return int(saved.read_text().strip())
        max_per_ray = int(
            getattr(self.model.config, "max_num_samples_per_ray", 256)
        )
        return self._to_bucket(self.config.target_num_samples // max(max_per_ray, 1))

    @staticmethod
    def _to_bucket(n: float) -> int:
        import math

        return int(min(max(2 ** round(math.log2(max(n, 1.0))), 256), 131072))

    def _bucket_step_fns(self, num_rays: int):
        """Jitted (single, multi) step programs for one ray-count bucket."""
        if num_rays not in self._bucket_steps:
            single = jax.jit(
                functools.partial(self._train_step_impl, num_rays=num_rays),
                donate_argnums=(0,),
            )

            def multi(state, train_data, cameras, num_steps):
                def body(s, _):
                    return self._train_step_impl(
                        s, train_data, cameras, num_rays=num_rays
                    )

                return jax.lax.scan(body, state, None, length=num_steps)

            self._bucket_steps[num_rays] = (
                single,
                jax.jit(multi, static_argnums=(3,), donate_argnums=(0,)),
            )
        return self._bucket_steps[num_rays]

    def _update_dynamic_batch(self, samples_per_batch: float) -> None:
        """Move to the bucket whose ray count meets the sample budget
        (reference dynamic_batch.py:72-76, quantized to powers of two)."""
        if not samples_per_batch or self._dyn_num_rays is None:
            return
        want = self._dyn_num_rays * (
            self.config.target_num_samples / max(samples_per_batch, 1.0)
        )
        new = self._to_bucket(want)
        if new != self._dyn_num_rays:
            print(
                f"[dynamic-batch] rays/batch {self._dyn_num_rays} -> {new} "
                f"(measured {samples_per_batch:,.0f} samples vs target "
                f"{self.config.target_num_samples:,})",
                flush=True,
            )
            self._dyn_num_rays = new

    @profiler.time_function
    def _train_step(self, state: TrainState, rng: Optional[jax.Array] = None):
        """One training step. The PRNG is carried in TrainState and split
        INSIDE the jitted program: this deployment's runtime keeps only a
        small program cache, and per-step host-side jax.random.split
        executables thrash it — every train-step call then pays a ~5.8s
        program reload. With the rng in-state, the train step is the ONLY
        program that executes per iteration. An explicit ``rng`` still
        overrides for deterministic tests."""
        if rng is not None:
            state = state.replace(rng=rng)
        elif state.rng is None:
            state = state.replace(rng=jax.random.PRNGKey(0))
        fn = (
            self._bucket_step_fns(self._dyn_num_rays)[0]
            if self._dyn_num_rays is not None
            else self._jit_train_step
        )
        return fn(
            state, self.datamanager.train_data, self.datamanager.train_cameras
        )

    @profiler.time_function
    def _train_multi(self, state: TrainState, num_steps: int):
        """``num_steps`` train steps as ONE dispatched program (lax.scan).
        Returns (state, metrics [num_steps, M]). Amortizes the per-dispatch
        relay round trip (see TrainerConfig.steps_per_call)."""
        if state.rng is None:
            state = state.replace(rng=jax.random.PRNGKey(0))
        fn = (
            self._bucket_step_fns(self._dyn_num_rays)[1]
            if self._dyn_num_rays is not None
            else self._jit_multi_step
        )
        return fn(
            state,
            self.datamanager.train_data,
            self.datamanager.train_cameras,
            num_steps,
        )

    def _multi_step_impl(self, state: TrainState, train_data, cameras, num_steps: int):
        def body(s, _):
            return self._train_step_impl(s, train_data, cameras)

        return jax.lax.scan(body, state, None, length=num_steps)

    # ------------------------------------------------------------------
    def _train_step_impl(self, state: TrainState, train_data, cameras, num_rays: Optional[int] = None):
        model, dm = self.model, self.datamanager
        step_f = state.step.astype(jnp.float32)
        sched = model.schedules(step_f)
        next_rng, rng_sample, rng_model, rng_loss, rng_grid = jax.random.split(state.rng, 5)

        # occupancy-grid updates (neus-acc / instant-ngp / neusW) run INSIDE
        # the step behind lax.cond: a separate jitted update program would
        # evict the train step from the runtime's program cache, degrading
        # every subsequent step ~1000x (see docs/tpu-design.md)
        model_state = state.model_state
        if getattr(model, "has_model_state", False) and hasattr(model, "update_model_state"):
            every = int(getattr(model, "model_state_update_every", 16))
            model_state = jax.lax.cond(
                state.step % every == 0,
                lambda ms: model.update_model_state(state.params, ms, state.step, rng_grid),
                lambda ms: ms,
                state.model_state,
            )

        accum = max(self.config.accumulate_grad_steps, 1)
        additional = None
        if hasattr(dm, "sample_train_batch_flexible"):
            ray_indices, batch, additional = dm.sample_train_batch_flexible(
                rng_sample, data=train_data
            )
        else:
            ray_indices, batch = dm.sample_train_batch(
                rng_sample, data=train_data,
                num_rays=(num_rays or dm.config.train_num_rays_per_batch) * accum,
            )
        # shard the ray batch across the mesh's data axis
        ray_indices = mesh_lib.shard_leading_axis(ray_indices, self.mesh)
        batch = mesh_lib.shard_leading_axis(batch, self.mesh)

        model_kwargs = (
            {"model_state": model_state}
            if getattr(model, "has_model_state", False)
            else {}
        )

        def loss_fn(params):
            cam_params = params.get("camera_opt")
            ray_bundle = dm.generate_rays(cam_params, ray_indices, cameras=cameras, train=True)
            if additional is not None and hasattr(model, "get_outputs_flexible"):
                outputs = model.get_outputs_flexible(
                    params, ray_bundle, additional, rng=rng_model, sched=sched, train=True
                )
            else:
                outputs = model.get_outputs(
                    params, ray_bundle, rng=rng_model, sched=sched, train=True, **model_kwargs
                )
            loss_dict = model.get_loss_dict(params, outputs, batch, sched, rng_loss)
            total = sum(loss_dict.values())
            metrics = model.get_metrics_dict(params, outputs, batch)
            return total, (loss_dict, metrics)

        if accum > 1 and additional is None:
            # accumulate grads over sub-batches with a scan (constant memory)
            R = num_rays or dm.config.train_num_rays_per_batch
            idx_chunks = ray_indices.reshape(accum, R, 3)
            batch_chunks = jax.tree_util.tree_map(
                lambda x: x.reshape(accum, R, *x.shape[1:]), batch
            )

            def chunk_grads(carry, inp):
                idx_c, batch_c = inp

                def loss_c(params):
                    cam_params = params.get("camera_opt")
                    rb = dm.generate_rays(cam_params, idx_c, cameras=cameras, train=True)
                    outputs = model.get_outputs(
                        params, rb, rng=rng_model, sched=sched, train=True, **model_kwargs
                    )
                    ld = model.get_loss_dict(params, outputs, batch_c, sched, rng_loss)
                    metrics = model.get_metrics_dict(params, outputs, batch_c)
                    return sum(ld.values()), (ld, metrics)

                (l, aux), g = jax.value_and_grad(loss_c, has_aux=True)(state.params)
                acc_g, acc_l = carry
                return (
                    jax.tree_util.tree_map(jnp.add, acc_g, g),
                    acc_l + l,
                ), aux

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (sum_g, sum_l), auxs = jax.lax.scan(
                chunk_grads, (zero_g, jnp.asarray(0.0)), (idx_chunks, batch_chunks)
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum, sum_g)
            loss = sum_l / accum
            loss_dict, metrics = jax.tree_util.tree_map(lambda x: x[-1], auxs)
        else:
            (loss, (loss_dict, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        # proposal update schedule (reference ray_samplers.py:551,570 +
        # torch optimizers skipping grad-None params): on non-update steps
        # the proposal group's params stay frozen. Grads are already cut
        # inside the sampler (lax.cond); zeroing the updates too prevents
        # Adam's decayed momentum from moving frozen params.
        tp = sched.get("train_proposal") if isinstance(sched, dict) else None
        if tp is not None and "proposal_networks" in updates:
            updates = dict(updates)
            updates["proposal_networks"] = jax.tree_util.tree_map(
                lambda u: jnp.where(tp, u, jnp.zeros_like(u)),
                updates["proposal_networks"],
            )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            model_state=model_state,
            rng=next_rng,
        )
        out = {"loss": loss, **loss_dict, **metrics}
        if num_rays is not None:
            # dynamic batch: surface the active bucket (reference
            # dynamic_batch.py:92 adds num_rays_per_batch the same way)
            out["num_rays_per_batch"] = jnp.asarray(float(num_rays))
        # pack metrics into ONE vector: each device->host transfer costs
        # ~2s through the axon relay, so a dict of scalars is ~2s x len
        # per fetch; a single [K] array is one transfer
        self._metric_keys = sorted(out.keys())
        metrics_vec = jnp.stack([jnp.asarray(out[k], jnp.float32) for k in self._metric_keys])
        return new_state, metrics_vec

    def unpack_metrics(self, metrics_vec) -> Dict[str, float]:
        vals = np.asarray(metrics_vec)  # one transfer
        return {k: float(v) for k, v in zip(self._metric_keys, vals)}

    def flush_metric_history(self, history, max_iters: int) -> Dict[str, float]:
        """Fetch every buffered metrics vector in ONE stacked device->host
        transfer and write the rows to the writer. The first D2H fetch in a
        process costs minutes on this deployment AND permanently degrades
        the train step (docs/tpu-design.md), so the loop buffers device
        arrays and this runs once, after training."""
        if not history:
            return {}
        t0 = time.perf_counter()
        steps = [s for s, _ in history]
        # icebreaker: the process's FIRST device->host fetch pays a one-time
        # ~5-13 min relay setup cost; pay it on a bare buffer fetch before
        # dispatching any new program (jnp.stack), which measured as the
        # reliable ordering (/tmp/tpu_segend.py probe)
        np.asarray(history[0][1])
        print(
            f"[trainer] first device->host fetch took {time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        stacked = jnp.stack([m for _, m in history])
        vals = np.asarray(stacked)  # ONE transfer
        print(
            f"[trainer] metric history fetched ({len(steps)} rows) in "
            f"{time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        last = {}
        for s, row in zip(steps, vals):
            metrics = {k: float(v) for k, v in zip(self._metric_keys, row)}
            self.writer.put_dict(metrics, s)
            last = metrics
        self.writer.print_row(steps[-1] + 1, max_iters, last)
        return last

    # ------------------------------------------------------------------
    def _render_chunk_impl(self, params, ray_bundle, step, model_state=None):
        sched = self.model.schedules(step)
        model_kwargs = (
            {"model_state": model_state}
            if getattr(self.model, "has_model_state", False)
            else {}
        )
        outputs = self.model.get_outputs(
            params, ray_bundle, rng=None, sched=sched, train=False, **model_kwargs
        )
        keep = {}
        for k in ("rgb", "depth", "accumulation", "normal", "normal_vis"):
            if k in outputs:
                keep[k] = outputs[k]
        return keep

    def render_image(self, params, camera_index: int, eval_cameras: bool = True) -> Dict[str, np.ndarray]:
        """Chunked full-image render (reference base_model.py:165-189)."""
        dm = self.datamanager
        bundle = (
            dm.eval_image_rays(camera_index)
            if eval_cameras
            else dm.train_cameras.generate_image_rays(camera_index)
        )
        chunk = self.model.config.eval_num_rays_per_chunk
        if self.config.defer_heavy_ops:
            # segment-end eval on the degraded program cache pays ~5.8s per
            # chunk call; fewer, larger chunks (forward-only, fits HBM)
            chunk = max(chunk, 8192)
        n = bundle.origins.shape[0]
        n_pad = ((n + chunk - 1) // chunk) * chunk
        pad = n_pad - n

        def pad_leaf(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n:
                return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0) if pad else x
            return x

        bundle = jax.tree_util.tree_map(pad_leaf, bundle)
        step = (
            self.state.step.astype(jnp.float32)
            if self.state is not None
            else jnp.asarray(1e9)
        )
        model_state = self.state.model_state if self.state is not None else None
        outs = []
        for i in range(n_pad // chunk):
            sl = jax.tree_util.tree_map(
                lambda x: x[i * chunk : (i + 1) * chunk]
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n_pad
                else x,
                bundle,
            )
            outs.append(self._render_chunk(params, sl, step, model_state))
        merged = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        # pack ALL outputs into one array and fetch ONCE: each device->host
        # transfer costs ~29s flat latency on the axon relay
        keys = sorted(merged.keys())
        widths = [merged[k].shape[-1] if merged[k].ndim > 1 else 1 for k in keys]
        packed = jnp.concatenate(
            [merged[k].reshape(n_pad, -1) for k in keys], axis=-1
        )
        packed_host = np.asarray(packed[:n])
        cams = dm.eval_cameras if (eval_cameras and dm.eval_cameras is not None) else dm.train_cameras
        h = int(np.asarray(cams.height)[camera_index])
        w = int(np.asarray(cams.width)[camera_index])
        out, off = {}, 0
        for k, c in zip(keys, widths):
            out[k] = packed_host[:, off : off + c].reshape(h, w, c)
            off += c
        return out

    @profiler.time_function
    def eval_image_metrics(self, camera_index: int) -> Dict[str, float]:
        """PSNR/SSIM on one eval image (reference base_pipeline.py:300-318)."""
        outputs = self.render_image(self.state.params, camera_index)
        gt = np.asarray(self.datamanager.eval_image_data(camera_index)["image"])[..., :3]
        rgb = outputs["rgb"]
        m = {
            "psnr": float(psnr_fn(jnp.asarray(rgb), jnp.asarray(gt))),
            "ssim": float(ssim_fn(jnp.asarray(rgb), jnp.asarray(gt))),
        }
        # LPIPS only when weights are supplied (SST_LPIPS_WEIGHTS;
        # reference base_surface_model.py:233-236 — see utils/metrics.py).
        # Non-canonical weights (make_lpips_weights.py) report as
        # "lpips_rand", never as "lpips".
        import os

        from sdfstudio_tpu.utils.metrics import lpips as lpips_fn
        from sdfstudio_tpu.utils.metrics import lpips_metric_name

        lp = lpips_fn(jnp.asarray(rgb), jnp.asarray(gt))
        if lp is not None:
            m[lpips_metric_name(os.environ["SST_LPIPS_WEIGHTS"])] = float(lp)
        return m

    # ------------------------------------------------------------------
    def train(self, num_iterations: Optional[int] = None):
        """Main loop (reference trainer.py:131-187)."""
        assert self.state is not None, "call setup() first"
        cfg = self.config
        max_iters = num_iterations or cfg.max_num_iterations

        # never int(self.state.step): a device->host fetch before the loop
        # poisons the program cache (docs/tpu-design.md)
        start_step = (
            self._host_step if self._host_step is not None else int(self.state.step)
        )
        steps_per_log = max(cfg.steps_per_log, 1)
        K = cfg.steps_per_call or (1 if jax.default_backend() == "cpu" else 10)
        # NOTE: K may exceed steps_per_log — the crossed() logging below then
        # simply logs once per K-window (window-amortized timing stays
        # honest). An earlier min(K, steps_per_log) clamp silently defeated
        # configs with steps_per_call > 10 (e.g. neus-facto-tpu's verified 25).
        K = max(1, K)

        def crossed(cadence: int, lo: int, hi: int) -> bool:
            """Does (lo, hi] contain a multiple of cadence?"""
            return cadence > 0 and hi // cadence > lo // cadence

        history = []  # (step, device metrics vec); fetched ONCE after the loop
        reached = self._train_loop(start_step, max_iters, K, steps_per_log, crossed, history)
        if reached < max_iters:
            # graceful ctrl+c (reference train.py:207-215): flush + checkpoint
            # at the last completed step below, so the run resumes instead of
            # losing the segment
            max_iters = reached

        self._host_step = max_iters
        # training is done; from here on device<->host traffic is fine
        # (segment end / end of run — the hot loop no longer needs the cache)
        last_metrics = self.flush_metric_history(history, max_iters)
        if self._dyn_num_rays is not None and cfg.defer_heavy_ops:
            # relay deployments adapt the bucket at segment boundaries only
            self._update_dynamic_batch(last_metrics.get("num_samples_per_batch", 0.0))
            if mesh_lib.is_main_process():
                self.ckpt_dir.mkdir(parents=True, exist_ok=True)
                (self.ckpt_dir / "dynamic_batch.txt").write_text(str(self._dyn_num_rays))
        trained_any = max_iters > start_step
        if trained_any and (
            cfg.defer_heavy_ops or getattr(self, "_interrupted_step", None) is not None
        ):
            t0 = time.perf_counter()
            self.save_checkpoint(max_iters)
            print(f"[trainer] checkpoint saved in {time.perf_counter() - t0:.1f}s", flush=True)
            if cfg.defer_heavy_ops and cfg.steps_per_eval_image > 0 and self.datamanager.num_eval_images:
                t0 = time.perf_counter()
                idx = int(np.random.RandomState(max_iters).randint(self.datamanager.num_eval_images))
                m = self.eval_image_metrics(idx)
                print(f"[trainer] segment-end eval rendered in {time.perf_counter() - t0:.1f}s", flush=True)
                self.writer.put_dict(m, max_iters, prefix="eval/")
                print(
                    f"[segment-end eval image {idx}] psnr={m['psnr']:.2f} ssim={m['ssim']:.4f}",
                    flush=True,
                )
        if (
            cfg.final_eval_gt
            and cfg.final_eval_output
            and max_iters >= cfg.max_num_iterations
            and getattr(self, "_interrupted_step", None) is None
            and mesh_lib.is_main_process()
        ):
            # full protocol eval in THIS process: training is over, so the
            # program-cache degradation extra executables cause no longer
            # matters, and a separate eval process's ~16-min relay startup
            # is saved (engine/final_eval.py)
            from sdfstudio_tpu.engine.final_eval import run_final_eval

            # base_dir layout is output/experiment/<method>/timestamp
            # (Config.get_base_dir), so the method name is the parent dir
            run_final_eval(self, method_name=self.base_dir.parent.name, reached_step=max_iters)
        return self.state

    def _train_loop(self, step, max_iters, K, steps_per_log, crossed, history):
        """The hot dispatch loop, separated so a ctrl+c can be converted
        into "stop at the last completed window" — train() then flushes and
        checkpoints at the returned step instead of losing the segment.
        Dispatched-but-unsynced windows count as completed: the device will
        finish them, and the checkpoint fetch waits for it."""
        try:
            return self._train_windows(
                step, max_iters, K, steps_per_log, crossed, history,
                time.perf_counter(), 0,
            )
        except KeyboardInterrupt:
            reached = getattr(self, "_loop_step", step)
            print(f"[trainer] interrupted at step {reached}; "
                  f"checkpointing before exit", flush=True)
            self._interrupted_step = reached
            return reached

    def _train_windows(self, step, max_iters, K, steps_per_log, crossed,
                       history, window_t0, window_steps):
        cfg = self.config
        self._loop_step = step
        while step < max_iters:
            # the ONLY device interaction per window is the train program
            # itself: any other program — and any device->host fetch — evicts
            # it from the runtime's program cache, degrading every later step
            # ~1000x (docs/tpu-design.md). Grid updates run inside the step
            # (lax.cond); metric values are buffered as device arrays here.
            # K steps execute as ONE dispatched scan program: per-dispatch
            # relay round trips (>1s measured) would otherwise dominate.
            k = min(K, max_iters - step)
            if k == 1:
                self.state, last_vec = self._train_step(self.state)
            else:
                self.state, mstack = self._train_multi(self.state, k)
                last_vec = jax.tree_util.tree_map(lambda x: x[-1], mstack)
            lo, step = step, step + k
            self._loop_step = step
            window_steps += k
            # subset image cache rotation (CacheDataloader semantics): a pure
            # H2D swap with constant shapes — no recompile, no D2H fetch
            self.datamanager.maybe_resample(step)
            if self.viewer_state is not None:
                # interleaved viewer rendering, reference trainer.py:166
                self.viewer_state.service()
            if crossed(steps_per_log, lo, step) or step >= max_iters:
                # steps dispatch asynchronously; timing must cover the whole
                # window up to this sync, divided by the steps in the window
                jax.block_until_ready(self.state.params)  # sync, NOT a fetch
                dt = (time.perf_counter() - window_t0) / max(window_steps, 1)
                window_t0 = time.perf_counter()
                window_steps = 0
                history.append((step - 1, last_vec))
                if (
                    self._dyn_num_rays is not None
                    and not cfg.defer_heavy_ops
                    and crossed(cfg.dynamic_update_every, lo, step)
                ):
                    # safe here: non-relay deployments tolerate the fetch,
                    # and the loop just synced anyway
                    m = self.unpack_metrics(last_vec)
                    self._update_dynamic_batch(m.get("num_samples_per_batch", 0.0))
                num_rays = self._dyn_num_rays or self.datamanager.config.train_num_rays_per_batch
                self.writer.put_scalar(writer_lib.ITER_TRAIN_TIME, dt, step - 1)
                self.writer.put_scalar(writer_lib.TRAIN_RAYS_PER_SEC, num_rays / dt, step - 1)
                # per-group lr telemetry (reference optimizers.py:160) —
                # schedules are pure functions of step, so this is pure host
                # math: no device fetch, no program-cache impact
                for gname, lr in learning_rates_at(self.optimizer_groups, step - 1).items():
                    self.writer.put_scalar(f"learning_rate/{gname}", lr, step - 1)
                print(
                    f"step {step}/{max_iters}  rays/s={num_rays / dt:,.0f}"
                    f"  eta={self.writer.eta(step - 1, max_iters)}",
                    flush=True,
                )

            if (
                not cfg.defer_heavy_ops
                and crossed(cfg.steps_per_eval_image, lo, step)
            ):
                idx = int(np.random.RandomState(step).randint(self.datamanager.num_eval_images))
                m = self.eval_image_metrics(idx)
                self.writer.put_dict(m, step - 1, prefix="eval/")
                print(f"[eval image {idx}] psnr={m['psnr']:.2f} ssim={m['ssim']:.4f}", flush=True)

            if not cfg.defer_heavy_ops and (
                crossed(cfg.steps_per_save, lo, step) or step >= max_iters
            ):
                self.save_checkpoint(step)

        return max_iters

    # ------------------------------------------------------------------
    @profiler.time_function
    def save_checkpoint(self, step: int):
        """Packed checkpoint (reference trainer.py:277-306 semantics; see
        utils/fast_checkpoint.py for why not per-array orbax here)."""
        if not mesh_lib.is_main_process():
            return
        from sdfstudio_tpu.utils.fast_checkpoint import save_packed

        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        path = self.ckpt_dir / f"step-{step:09d}"
        payload = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "model_state": self.state.model_state,
            "rng": self.state.rng,
        }
        save_packed(path, payload)
        (path / "step.txt").write_text(str(step))
        if self.config.save_only_latest_checkpoint:
            for p in sorted(self.ckpt_dir.glob("step-*")):
                if p != path:
                    import shutil

                    shutil.rmtree(p, ignore_errors=True)
        print(f"saved checkpoint {path}", flush=True)

    def _load_checkpoint(self, load_dir: Path, load_step: Optional[int] = None):
        """Resume (reference trainer.py:254-275)."""
        from sdfstudio_tpu.utils.fast_checkpoint import load_packed

        load_dir = Path(load_dir)
        if load_step is None:
            # step.txt is written LAST by save_checkpoint: a dir without it
            # is a partial save from a crash and must not poison the resume
            steps = sorted(
                int(p.name.split("-")[1])
                for p in load_dir.glob("step-*")
                if (p / "step.txt").exists()
            )
            assert steps, f"no complete checkpoints in {load_dir}"
            load_step = steps[-1]
        path = load_dir / f"step-{load_step:09d}"
        template = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "model_state": self.state.model_state,
            "rng": self.state.rng,
        }
        restored = load_packed(path, template)
        # same replicated placement as setup(): a sharding mismatch vs the
        # first compile silently retraces the train step (minutes on TPU)
        self.state = mesh_lib.put_replicated(
            TrainState(
                step=jnp.asarray(load_step, jnp.int32),
                params=restored["params"],
                opt_state=restored["opt_state"],
                model_state=restored["model_state"],
                rng=restored["rng"],
            ),
            self.mesh,
        )
        self._host_step = load_step
        print(f"loaded checkpoint from {path} at step {load_step}", flush=True)
