"""Data manager: cache-everything design with ON-DEVICE pixel sampling.

Functional spec: reference nerfstudio/data/datamanagers/base_datamanager.py:292-498
(VanillaDataManager = CacheDataloader + PixelSampler + CameraOptimizer +
RayGenerator) and data/pixel_samplers.py / utils/dataloaders.py.

TPU-native redesign: ALL images (plus mono cues / masks) are stacked into
device arrays once at startup (the reference's CacheDataloader caches
collated images in GPU memory — dataloaders.py:94-115). Per step, pixel
index sampling, gather, camera-optimizer pose deltas, and ray generation all
happen INSIDE the jitted train step via :meth:`sample_train_batch` and
:meth:`generate_rays` — zero host↔device traffic in steady state.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdfstudio_tpu.cameras.camera_optimizers import CameraOptimizer, CameraOptimizerConfig
from sdfstudio_tpu.cameras.cameras import Cameras
from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.data.dataparsers.base import DataparserOutputs, load_image


@dataclasses.dataclass
class DataManagerConfig:
    """Mirror of VanillaDataManagerConfig essentials (base_datamanager.py:255-290)."""

    train_num_rays_per_batch: int = 1024
    eval_num_rays_per_batch: int = 1024
    camera_optimizer: CameraOptimizerConfig = CameraOptimizerConfig()
    kind: str = "vanilla"  # vanilla | flexible (patch-warp source views)
    neighbors_num: Optional[int] = None
    # subset image caching for datasets too large for HBM (the reference's
    # CacheDataloader num_images_to_sample_from / num_times_to_repeat_images,
    # dataloaders.py:40-115): cache N images on device, resample every M
    # steps via a host->device swap (same shapes -> no recompile).
    train_num_images_to_sample_from: int = -1  # -1 = cache everything
    train_num_times_to_repeat_images: int = -1  # -1 = never resample


def _pad_stack(arrays) -> np.ndarray:
    """Stack per-image arrays that may differ in (H, W) by zero-padding to
    the max resolution — the TPU-native (static-shape) replacement for the
    reference's list-of-tensors ``BasicImages`` / ``GeneralizedDataset``
    variable-resolution path (reference datasets/base_dataset.py:135-191,
    utils/images.py:26). Per-image valid extents live in
    ``VanillaDataManager.image_heights/widths`` and bound pixel sampling."""
    arrays = [np.asarray(a) for a in arrays]
    shapes = {a.shape for a in arrays}
    if len(shapes) == 1:
        return np.stack(arrays)
    h = max(a.shape[0] for a in arrays)
    w = max(a.shape[1] for a in arrays)
    out = np.zeros((len(arrays), h, w) + arrays[0].shape[2:], arrays[0].dtype)
    for i, a in enumerate(arrays):
        out[i, : a.shape[0], : a.shape[1]] = a
    return out


class VanillaDataManager:
    """Holds device-resident dataset tensors + pure sampling functions."""

    def __init__(
        self,
        config: DataManagerConfig,
        train_outputs: DataparserOutputs,
        eval_outputs: Optional[DataparserOutputs] = None,
    ):
        self.config = config
        self.train_outputs = train_outputs
        self.eval_outputs = eval_outputs
        self.train_cameras: Cameras = train_outputs.cameras
        self.eval_cameras: Optional[Cameras] = (
            eval_outputs.cameras if eval_outputs is not None else None
        )

        full = self._stack(train_outputs)
        n_total = full["image"].shape[0]
        n_sub = config.train_num_images_to_sample_from
        self.subset_mode = 0 < n_sub < n_total
        if self.subset_mode:
            # keep the full (padded) stack in host RAM; only a rotating
            # subset lives in HBM (CacheDataloader semantics)
            self._host_train_data = full
            self._subset_rng = np.random.default_rng(303)
            self.train_data = self._make_subset()
        else:
            self.train_data = {k: jnp.asarray(v) for k, v in full.items()}
        ev = self._stack(eval_outputs) if eval_outputs is not None else None
        self.eval_data = (
            {k: jnp.asarray(v) for k, v in ev.items()} if ev is not None else None
        )

        self.num_train_images = n_total
        self.image_height = self.train_data["image"].shape[1]
        self.image_width = self.train_data["image"].shape[2]

        # per-image valid extents (variable-resolution datasets are padded
        # to the max H x W by _pad_stack; sampling stays inside each image)
        hs = np.asarray(self.train_cameras.height).reshape(-1).astype(np.int32)
        ws = np.asarray(self.train_cameras.width).reshape(-1).astype(np.int32)
        self.variable_res = bool((hs != hs[0]).any() or (ws != ws[0]).any())
        self.image_heights = jnp.asarray(hs)
        self.image_widths = jnp.asarray(ws)

        self.camera_optimizer = CameraOptimizer(
            num_cameras=self.num_train_images, config=config.camera_optimizer
        )
        self.mesh = None  # set by Trainer via commit() for multi-process runs

    def commit(self, mesh) -> None:
        """Pin dataset tensors to ``mesh`` fully replicated. Required for
        multi-process meshes (plain ``jnp.asarray`` arrays are process-local
        and cannot feed a global-mesh jit); a cheap no-op placement refresh
        single-process. Every DDP rank holds the full image stack, like the
        reference's per-rank CacheDataloader (dataloaders.py:94)."""
        from sdfstudio_tpu.parallel import mesh as mesh_lib

        self.mesh = mesh
        self.train_data = mesh_lib.put_replicated(self.train_data, mesh)

    @staticmethod
    def _stack(outputs: DataparserOutputs) -> Dict[str, jnp.ndarray]:
        def load(f):
            img = load_image(f)
            if img.shape[-1] == 4:
                # alpha composite over the parser's alpha_color
                # (reference datasets/base_dataset.py:85-92)
                bg = (
                    outputs.alpha_color
                    if outputs.alpha_color is not None
                    else np.ones(3, np.float32)
                )
                img = img[..., :3] * img[..., 3:] + bg * (1.0 - img[..., 3:])
            return img[..., :3]

        images = _pad_stack([load(f) for f in outputs.image_filenames])
        data = {"image": images}  # host numpy; callers device_put
        if outputs.depths:
            data["depth"] = _pad_stack(list(outputs.depths))
        if outputs.normals:
            data["normal"] = _pad_stack(list(outputs.normals))
        if outputs.sensor_depths:
            data["sensor_depth"] = _pad_stack(list(outputs.sensor_depths))
        if outputs.fg_masks:
            data["fg_mask"] = _pad_stack(list(outputs.fg_masks))
        return data

    def _make_subset(self) -> Dict[str, jnp.ndarray]:
        """Device-cache a fresh random subset of the host image stack
        (reference CacheDataloader resampling, dataloaders.py:94-115).
        Shapes are constant across resamples, so swapping the returned dict
        into the jitted step never retraces; the H2D transfer is the only
        host cost."""
        n_sub = self.config.train_num_images_to_sample_from
        ids = self._subset_rng.choice(
            self._host_train_data["image"].shape[0], size=n_sub, replace=False
        ).astype(np.int32)
        data = {k: jnp.asarray(v[ids]) for k, v in self._host_train_data.items()}
        data["_global_ids"] = jnp.asarray(ids)
        return data

    def maybe_resample(self, step: int) -> None:
        """Rotate the cached image subset every
        ``train_num_times_to_repeat_images`` steps (no-op otherwise). Robust
        to multi-step strides (the trainer advances K steps per call)."""
        repeat = self.config.train_num_times_to_repeat_images
        if not self.subset_mode or repeat <= 0:
            return
        last = getattr(self, "_last_resample_step", 0)
        if step - last >= repeat:
            self._last_resample_step = step
            self.train_data = self._make_subset()
            if self.mesh is not None:
                from sdfstudio_tpu.parallel import mesh as mesh_lib

                # same rng seed on every process -> same subset ids, so the
                # replicated placement is consistent across hosts
                self.train_data = mesh_lib.put_replicated(self.train_data, self.mesh)

    # ------------------------------------------------------------------
    def init_camera_opt(self, rng: jax.Array):
        return self.camera_optimizer.init(rng, jnp.zeros((1,), jnp.int32))["params"]

    def sample_train_batch(
        self,
        rng: jax.Array,
        num_rays: Optional[int] = None,
        data: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Random (camera, y, x) indices + gathered per-pixel supervision
        (reference pixel_samplers.py:27-64,184). Pure; call inside jit.

        IMPORTANT: inside a jitted step, pass ``data`` explicitly as a jit
        argument — closing over the image tensors bakes them into the HLO
        as multi-MB constants (and has crashed the TPU compiler's fusion
        pass on large programs)."""
        data = data if data is not None else self.train_data
        R = num_rays or self.config.train_num_rays_per_batch
        kc, ky, kx = jax.random.split(rng, 3)
        gids = data.get("_global_ids")
        if gids is not None:
            # subset cache mode: sample within the cached slab, but report
            # GLOBAL camera ids (camera params / pose deltas / extents are
            # indexed globally)
            slot = jax.random.randint(kc, (R,), 0, gids.shape[0])
            cam = gids[slot]
        else:
            slot = cam = jax.random.randint(kc, (R,), 0, self.num_train_images)
        if self.variable_res:
            # uniform within each sampled image's own extent (the reference
            # samples per-image from the BasicImages list,
            # pixel_samplers.py:96-160)
            hy = self.image_heights[cam].astype(jnp.float32)
            wx = self.image_widths[cam].astype(jnp.float32)
            y = jnp.minimum(
                (jax.random.uniform(ky, (R,)) * hy).astype(jnp.int32),
                self.image_heights[cam] - 1,
            )
            x = jnp.minimum(
                (jax.random.uniform(kx, (R,)) * wx).astype(jnp.int32),
                self.image_widths[cam] - 1,
            )
        else:
            y = jax.random.randint(ky, (R,), 0, self.image_height)
            x = jax.random.randint(kx, (R,), 0, self.image_width)
        batch = {k: v[slot, y, x] for k, v in data.items() if k != "_global_ids"}
        ray_indices = jnp.stack([cam, y, x], axis=-1)
        return ray_indices, batch

    def generate_rays(
        self,
        camera_opt_params,
        ray_indices: jnp.ndarray,  # [R, 3] (cam, y, x)
        cameras: Optional[Cameras] = None,
        train: bool = True,
    ) -> RayBundle:
        """(cam, y, x) -> RayBundle with pose correction
        (reference ray_generators.py:26-59). Pixel centers at +0.5."""
        cams = cameras if cameras is not None else self.train_cameras
        cam = ray_indices[:, 0]
        coords = ray_indices[:, 1:].astype(jnp.float32) + 0.5
        if train and self.config.camera_optimizer.mode != "off":
            correction = self.camera_optimizer.apply({"params": camera_opt_params}, cam)
        else:
            correction = None
        return cams.generate_rays(cam, coords, camera_opt_to_camera=correction)

    # ------------------------------------------------------------------
    def eval_image_data(self, image_index: int) -> Dict[str, jnp.ndarray]:
        if self.eval_data is not None:
            data = self.eval_data
        elif self.subset_mode:
            data = self._host_train_data  # full stack lives on host
        else:
            data = self.train_data
        cams = self.eval_cameras if self.eval_data is not None else self.train_cameras
        # crop away _pad_stack padding for variable-resolution datasets
        h = int(np.asarray(cams.height).reshape(-1)[image_index])
        w = int(np.asarray(cams.width).reshape(-1)[image_index])
        return {k: v[image_index][:h, :w] for k, v in data.items()}

    def eval_image_rays(self, image_index: int) -> RayBundle:
        cams = self.eval_cameras if self.eval_cameras is not None else self.train_cameras
        return cams.generate_image_rays(image_index)

    @property
    def num_eval_images(self) -> int:
        if self.eval_data is not None:
            return self.eval_data["image"].shape[0]
        return self.num_train_images


def gather_cameras(cameras: Cameras, indices: jnp.ndarray) -> Cameras:
    """Index a Cameras pytree by camera indices (jit-safe)."""
    return jax.tree_util.tree_map(
        lambda leaf: leaf[indices] if hasattr(leaf, "ndim") and leaf.ndim >= 1 else leaf,
        cameras,
    )


class FlexibleDataManager(VanillaDataManager):
    """Patch-warping data manager: each batch samples all rays from ONE
    reference image and carries that image's source views
    (reference base_datamanager.py:466-498 + get_src_from_pairs,
    sdfstudio_dataparser.py:83-110).
    """

    def __init__(self, config, train_outputs, eval_outputs=None, neighbors_num: Optional[int] = None):
        super().__init__(config, train_outputs, eval_outputs)
        assert not self.subset_mode, (
            "subset image caching is not supported with the flexible "
            "(patch-warp) datamanager — source views must stay resident"
        )
        assert train_outputs.pairs_srcs is not None, (
            "FlexibleDataManager needs pairs.txt (dataparser load_pairs=True)"
        )
        pairs = np.asarray(train_outputs.pairs_srcs)
        if neighbors_num is not None:
            pairs = pairs[:, : neighbors_num + 1]
        self.pairs_srcs = jnp.asarray(pairs, jnp.int32)  # [N, 1 + num_src]

    def sample_train_batch_flexible(
        self,
        rng: jax.Array,
        num_rays: Optional[int] = None,
        data: Optional[Dict[str, jnp.ndarray]] = None,
    ):
        """Like sample_train_batch but single-reference-image + src views.
        Returns (ray_indices, batch, additional)."""
        data = data if data is not None else self.train_data
        R = num_rays or self.config.train_num_rays_per_batch
        ki, ky, kx = jax.random.split(rng, 3)
        ref = jax.random.randint(ki, (), 0, self.num_train_images)
        cam = jnp.full((R,), ref, jnp.int32)
        y = jax.random.randint(ky, (R,), 0, self.image_height)
        x = jax.random.randint(kx, (R,), 0, self.image_width)
        batch = {k: v[cam, y, x] for k, v in data.items()}
        ray_indices = jnp.stack([cam, y, x], axis=-1)
        src_idxs = self.pairs_srcs[ref]  # [1 + num_src]
        additional = {
            "uv": jnp.stack([y, x], axis=-1),
            "src_idxs": src_idxs,
            "src_imgs": data["image"][src_idxs],
            "src_cameras": gather_cameras(self.train_cameras, src_idxs),
        }
        return ray_indices, batch, additional
