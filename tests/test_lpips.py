"""LPIPS plumbing (utils/metrics.py): the VGG16-structure network +
linear heads run from a supplied .npz (pretrained weights are not
obtainable offline; reference base_surface_model.py:233-236 uses
torchmetrics LPIPS-VGG). Random weights prove the metric's structure:
zero for identical inputs, positive and symmetric for different ones."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def weights_npz(tmp_path_factory):
    from sdfstudio_tpu.utils.metrics import _VGG16_PLAN

    rng = np.random.RandomState(0)
    data = {}
    cin = 3
    for i, (cout, _) in enumerate(_VGG16_PLAN):
        data[f"conv{i}_w"] = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05
        data[f"conv{i}_b"] = rng.randn(cout).astype(np.float32) * 0.01
        cin = cout
    taps = [64, 128, 256, 512, 512]
    for s, c in enumerate(taps):
        data[f"lin{s}"] = np.abs(rng.randn(c)).astype(np.float32)
    path = tmp_path_factory.mktemp("w") / "lpips.npz"
    np.savez(path, **data)
    return path


def test_lpips_structure(weights_npz):
    from sdfstudio_tpu.utils.metrics import load_lpips_weights, lpips

    w = load_lpips_weights(weights_npz)
    rng = np.random.RandomState(1)
    a = rng.rand(64, 64, 3).astype(np.float32)
    b = rng.rand(64, 64, 3).astype(np.float32)
    same = float(lpips(a, a, weights=w))
    diff = float(lpips(a, b, weights=w))
    sym = float(lpips(b, a, weights=w))
    assert same == pytest.approx(0.0, abs=1e-6)
    assert diff > 1e-4
    assert diff == pytest.approx(sym, rel=1e-4)
    # a small perturbation scores between identical and unrelated
    near = float(lpips(a, np.clip(a + 0.02 * rng.randn(*a.shape), 0, 1).astype(np.float32), weights=w))
    assert 0 < near < diff


def test_lpips_none_without_weights(monkeypatch):
    from sdfstudio_tpu.utils.metrics import lpips

    monkeypatch.delenv("SST_LPIPS_WEIGHTS", raising=False)
    assert lpips(np.zeros((8, 8, 3)), np.zeros((8, 8, 3))) is None


def test_generated_weights_are_noncanonical_and_usable(tmp_path):
    """make_lpips_weights output: deterministic, loadable, stamped
    canonical=0 so it reports as lpips_rand, and behaves like a distance."""
    from sdfstudio_tpu.scripts.make_lpips_weights import make_weights
    from sdfstudio_tpu.utils.metrics import (
        load_lpips_weights,
        lpips,
        lpips_metric_name,
    )

    path = tmp_path / "lpips_rand.npz"
    np.savez(path, **make_weights(seed=0))
    again = make_weights(seed=0)
    assert np.array_equal(np.load(path)["conv0_w"], again["conv0_w"])
    assert lpips_metric_name(path) == "lpips_rand"

    w = load_lpips_weights(path)
    rng = np.random.RandomState(2)
    a = rng.rand(32, 32, 3).astype(np.float32)
    b = rng.rand(32, 32, 3).astype(np.float32)
    assert float(lpips(a, a, weights=w)) == pytest.approx(0.0, abs=1e-6)
    assert float(lpips(a, b, weights=w)) > 1e-4


def test_canonical_weights_report_as_lpips(tmp_path, weights_npz):
    """Weight files without the canonical=0 stamp (i.e. real published
    weights a user supplies) keep the plain lpips column name."""
    from sdfstudio_tpu.utils.metrics import lpips_metric_name

    assert lpips_metric_name(weights_npz) == "lpips"
