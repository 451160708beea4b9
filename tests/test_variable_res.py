"""Variable-resolution dataset support (pad-to-max + per-image-bounds
sampling — the TPU equivalent of the reference's BasicImages /
VariableResDataManager, datasets/base_dataset.py:135-191)."""
import tempfile
from pathlib import Path

import jax
import numpy as np
import pytest
from PIL import Image

from sdfstudio_tpu.cameras.cameras import Cameras, CameraType
from sdfstudio_tpu.core.scene_box import SceneBox
from sdfstudio_tpu.data.datamanager import DataManagerConfig, VanillaDataManager
from sdfstudio_tpu.data.dataparsers.base import DataparserOutputs


@pytest.fixture(scope="module")
def varres_outputs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("varres")
    sizes = [(24, 32), (16, 20), (28, 24)]  # (H, W)
    files = []
    for i, (h, w) in enumerate(sizes):
        img = (np.random.default_rng(i).random((h, w, 3)) * 255).astype(np.uint8)
        f = tmp / f"img_{i}.png"
        Image.fromarray(img).save(f)
        files.append(f)
    n = len(sizes)
    poses = np.tile(np.eye(4, dtype=np.float32)[None, :3, :4], (n, 1, 1))
    cams = Cameras.create(
        camera_to_worlds=poses,
        fx=np.full(n, 20.0, np.float32),
        fy=np.full(n, 20.0, np.float32),
        cx=np.array([w / 2 for _, w in sizes], np.float32),
        cy=np.array([h / 2 for h, _ in sizes], np.float32),
        width=np.array([w for _, w in sizes], np.int32),
        height=np.array([h for h, _ in sizes], np.int32),
        camera_type=CameraType.PERSPECTIVE,
    )
    box = SceneBox(
        aabb=np.asarray([[-1, -1, -1], [1, 1, 1]], np.float32),
        near=0.1, far=4.0, radius=1.0, collider_type="near_far",
    )
    return DataparserOutputs(image_filenames=files, cameras=cams, scene_box=box)


def test_pad_stack_and_bounds(varres_outputs):
    dm = VanillaDataManager(DataManagerConfig(), varres_outputs)
    assert dm.variable_res
    assert dm.train_data["image"].shape == (3, 28, 32, 3)
    # sampling never leaves each image's valid extent
    idx, batch = dm.sample_train_batch(jax.random.PRNGKey(0), num_rays=4096)
    idx = np.asarray(idx)
    hs = np.array([24, 16, 28])
    ws = np.array([32, 20, 24])
    assert (idx[:, 1] < hs[idx[:, 0]]).all()
    assert (idx[:, 2] < ws[idx[:, 0]]).all()
    # batch rgb matches the gathered pixels
    img = np.asarray(dm.train_data["image"])
    assert np.allclose(
        np.asarray(batch["image"]), img[idx[:, 0], idx[:, 1], idx[:, 2]]
    )


def test_eval_image_data_crops_padding(varres_outputs):
    dm = VanillaDataManager(DataManagerConfig(), varres_outputs)
    d = dm.eval_image_data(1)
    assert d["image"].shape == (16, 20, 3)


def test_subset_image_cache(varres_outputs):
    """CacheDataloader semantics: N-of-all device cache + rotation."""
    cfg = DataManagerConfig(
        train_num_images_to_sample_from=2, train_num_times_to_repeat_images=5
    )
    dm = VanillaDataManager(cfg, varres_outputs)
    assert dm.subset_mode
    assert dm.train_data["image"].shape[0] == 2
    assert dm.num_train_images == 3  # global count preserved
    gids0 = np.asarray(dm.train_data["_global_ids"])
    idx, batch = dm.sample_train_batch(jax.random.PRNGKey(0), num_rays=512)
    idx = np.asarray(idx)
    # only cached images are sampled, reported as GLOBAL ids
    assert set(np.unique(idx[:, 0])) <= set(gids0.tolist())
    # pixels match the host stack at the global index
    host = dm._host_train_data["image"]
    assert np.allclose(np.asarray(batch["image"]), host[idx[:, 0], idx[:, 1], idx[:, 2]])
    # bounds respect the GLOBAL per-image extents
    hs = np.array([24, 16, 28]); ws = np.array([32, 20, 24])
    assert (idx[:, 1] < hs[idx[:, 0]]).all() and (idx[:, 2] < ws[idx[:, 0]]).all()
    # rotation changes the cached subset eventually, same shapes
    shapes_before = {k: v.shape for k, v in dm.train_data.items()}
    changed = False
    for step in range(5, 40, 5):
        dm.maybe_resample(step)
        if not np.array_equal(np.asarray(dm.train_data["_global_ids"]), gids0):
            changed = True
            break
    assert changed
    assert {k: v.shape for k, v in dm.train_data.items()} == shapes_before
    # full-image eval still sees every image (from the host stack)
    assert dm.eval_image_data(2)["image"].shape == (28, 24, 3)
