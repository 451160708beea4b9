"""In-process end-of-training evaluation: eval-split PSNR/SSIM + Chamfer-L1.

Runs INSIDE the training process right after the final checkpoint, where the
relay deployment's program-cache degradation no longer matters (training is
over) and the ~16-min fixed startup of a separate eval process is avoided
entirely (docs/tpu-design.md "Deployment quirks").

Relay-safe structure — the same rules the train loop obeys:

* ONE jitted program per image shape: the chunk loop runs inside the program
  via ``lax.map`` and PSNR/SSIM are computed on device, so each image costs
  exactly one dispatch and zero device->host fetches;
* per-image metric scalars stay on device and are fetched in ONE stacked
  transfer at the end (each D2H fetch pays ~29s flat latency on the relay);
* the SDF grid for marching cubes is evaluated by ``evaluate_sdf_grid``
  (utils/marching_cubes.py), which is itself one dispatch + one fetch.

Functional spec: reference scripts/eval.py:37-80 (average eval-image
metrics) + scripts/extract_mesh.py:36 / nerfstudio/utils/marching_cubes.py
(mesh extraction for the geometry benchmark); protocol in
docs/parity-protocol.md.
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdfstudio_tpu.utils.metrics import psnr as psnr_fn, ssim as ssim_fn


def _chunked(bundle, n: int, chunk: int):
    """Reshape every [n, ...] leaf to [C, chunk, ...] (padded by repeating
    the last ray — identical to Trainer.render_image's padding)."""
    c = (n + chunk - 1) // chunk
    pad = c * chunk - n

    def f(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n:
            if pad:
                x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
            return x.reshape((c, chunk) + x.shape[1:])
        return x

    return jax.tree_util.tree_map(f, bundle)


def _build_image_metrics_fn(trainer, h: int, w: int, chunk: int):
    """One jitted program: render ALL chunks of one image (lax.map) and
    reduce to (psnr, ssim) on device."""
    n = h * w

    def fn(params, bundle_chunks, gt, step, model_state):
        def body(rb):
            out = trainer._render_chunk_impl(params, rb, step, model_state)
            return out["rgb"]

        rgb = jax.lax.map(body, bundle_chunks)  # [C, chunk, 3]
        rgb = rgb.reshape(-1, rgb.shape[-1])[:n].reshape(h, w, -1)
        return psnr_fn(rgb, gt), ssim_fn(rgb, gt)

    return jax.jit(fn)


def eval_all_images(trainer, max_images: int = 0) -> Dict[str, float]:
    """Average PSNR/SSIM over the eval split, relay-safe (one dispatch per
    image, one stacked fetch at the end)."""
    dm = trainer.datamanager
    n_imgs = dm.num_eval_images
    if max_images > 0 and max_images < n_imgs:
        # even spread across the split, deterministic
        idxs = np.unique(np.linspace(0, n_imgs - 1, max_images).astype(int))
    else:
        idxs = np.arange(n_imgs)
    chunk = max(trainer.model.config.eval_num_rays_per_chunk, 8192)
    step = trainer.state.step.astype(jnp.float32)
    params = trainer.state.params
    model_state = trainer.state.model_state

    fns = {}
    per_image = []
    t0 = time.perf_counter()
    for i in idxs:
        gt = dm.eval_image_data(int(i))["image"][..., :3]
        h, w = int(gt.shape[0]), int(gt.shape[1])
        if (h, w) not in fns:
            fns[(h, w)] = _build_image_metrics_fn(trainer, h, w, chunk)
        bundle = _chunked(dm.eval_image_rays(int(i)), h * w, chunk)
        per_image.append(jnp.stack(fns[(h, w)](params, bundle, gt, step, model_state)))
    vals = np.asarray(jnp.stack(per_image))  # ONE fetch: [N, 2]
    dt = time.perf_counter() - t0
    print(
        f"[final-eval] {len(idxs)} images in {dt:.1f}s "
        f"({dt / max(len(idxs), 1):.1f}s/image)",
        flush=True,
    )
    return {
        "psnr": float(vals[:, 0].mean()),
        "ssim": float(vals[:, 1].mean()),
        "num_images": int(len(idxs)),
    }


def eval_geometry(
    trainer,
    gt: str,
    resolution: int = 256,
    mesh_path: Optional[Path] = None,
    bound: float = 1.0,
    data_dir: Optional[Path] = None,
) -> Dict[str, float]:
    """Marching-cubes mesh from the trained SDF + Chamfer-L1 against the
    analytic GT (mirrors scripts/benchmarking/eval_geometry.py, in-process)."""
    from sdfstudio_tpu.utils.marching_cubes import get_surface_sliding

    field = trainer.model.field
    sdf_fn = field.sdf_fn(trainer.state.params["field"])
    t0 = time.perf_counter()
    mesh = get_surface_sliding(
        sdf_fn,
        resolution=resolution,
        bounding_box_min=(-bound,) * 3,
        bounding_box_max=(bound,) * 3,
    )
    if mesh_path is not None and len(mesh.vertices):
        Path(mesh_path).parent.mkdir(parents=True, exist_ok=True)
        mesh.export(mesh_path)
    v = np.asarray(mesh.vertices)
    if len(v) == 0:
        print("[final-eval] no surface found", flush=True)
        return {"chamfer_l1": None}
    if gt == "dtu-like":
        from sdfstudio_tpu.data.synthetic_dtu import chamfer_l1_to_gt

        m = chamfer_l1_to_gt(v)
    elif gt == "heritage-like":
        from sdfstudio_tpu.data.synthetic_heritage import chamfer_l1_to_gt

        if data_dir is None:
            raise ValueError("heritage-like GT needs the scene dir (config.data)")
        m = chamfer_l1_to_gt(v, data_dir)
    else:  # analytic sphere
        from sdfstudio_tpu.scripts.benchmarking.eval_geometry import (
            chamfer_l1_to_sphere,
        )

        m = chamfer_l1_to_sphere(v, radius=0.5)
    print(
        f"[final-eval] geometry: verts={len(v)} chamfer_l1={m['chamfer_l1']:.4f} "
        f"(res={resolution}, {time.perf_counter() - t0:.1f}s)",
        flush=True,
    )
    return {
        "chamfer_l1": float(m["chamfer_l1"]),
        "chamfer_accuracy": float(m["accuracy"]),
        "chamfer_completeness": float(m["completeness"]),
        "mc_resolution": resolution,
    }


def run_final_eval(trainer, method_name: str, reached_step: int) -> dict:
    """Full end-of-run evaluation per TrainerConfig.final_eval_* settings;
    writes a parity-metrics-schema JSON (docs/parity-protocol.md) and
    returns it. ``eval_seconds`` lets wall-clock throughput accounting
    subtract the eval from the training process's wall time."""
    cfg = trainer.config
    t0 = time.time()
    rec = {"method": method_name, "iters": reached_step}
    rec.update(eval_all_images(trainer, max_images=cfg.final_eval_max_images))
    data_dir = None
    if cfg.final_eval_gt == "heritage-like":
        # the scene dir comes from the run's saved config (train.py main()
        # writes base_dir/config.yml before training)
        from sdfstudio_tpu.configs.base import Config

        data_dir = Config.load_config(trainer.base_dir / "config.yml").data
    rec.update(
        eval_geometry(
            trainer,
            gt=cfg.final_eval_gt,
            resolution=cfg.final_eval_resolution,
            mesh_path=Path(cfg.final_eval_mesh) if cfg.final_eval_mesh else None,
            data_dir=data_dir,
        )
    )
    rec["eval_seconds"] = round(time.time() - t0, 1)
    rec["eval_backend"] = jax.default_backend()
    rec["source"] = "trainer-final-eval"
    out = Path(cfg.final_eval_output)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(rec, indent=2))
    print(f"[final-eval] {json.dumps(rec)}", flush=True)
    return rec
