"""Tests for the parity-attestation driver
(sdfstudio_tpu/scripts/benchmarking/parity.py; protocol in
docs/parity-protocol.md): fast tests cover the decision logic that gates
bench.py; the slow e2e smoke drives the FULL pipeline (scene -> segmented
training of both arms with a resume -> PSNR + Chamfer eval ->
PARITY.json) on CPU with a tiny scene."""
import importlib
import json
import sys

import pytest


def _load_parity(tmp_path, monkeypatch):
    monkeypatch.setenv("SST_PARITY_DIR", str(tmp_path))
    sys.modules.pop("sdfstudio_tpu.scripts.benchmarking.parity", None)
    import sdfstudio_tpu.scripts.benchmarking.parity as parity

    return importlib.reload(parity)


def test_latest_step_picks_max_complete(tmp_path, monkeypatch):
    parity = _load_parity(tmp_path, monkeypatch)
    ck = parity.ckpt_dir("neus-facto")
    for step, complete in [(10, True), (25, True), (40, False)]:
        d = ck / f"step-{step:09d}"
        d.mkdir(parents=True)
        if complete:  # step.txt is written last by save_checkpoint
            (d / "step.txt").write_text(str(step))
    assert parity.latest_step("neus-facto") == 25
    assert parity.latest_step("other-method") == 0


def test_attestation_pass_and_fail(tmp_path, monkeypatch):
    parity = _load_parity(tmp_path, monkeypatch)
    control = {"method": "neus-facto", "psnr": 30.0, "chamfer_l1": 0.010,
               "iters": 20000}

    good = {"method": "neus-facto-tpu", "psnr": 29.8, "chamfer_l1": 0.0105,
            "iters": 20000}
    parity.write_attestation(good, control, holdout=8)
    rec = json.loads(parity.ATTESTATION.read_text())
    assert rec["pass"] and rec["method"] == "neus-facto-tpu"
    # the attestation records the step each arm was ACTUALLY trained to
    assert rec["preset"]["iters"] == 20000
    assert rec["control"]["iters"] == 20000
    assert rec["holdout"] == 8  # split provenance recorded

    # 0.5 dB below control -> fail even with better chamfer
    bad = {"method": "neus-facto-tpu", "psnr": 29.5, "chamfer_l1": 0.008,
           "iters": 20000}
    parity.write_attestation(bad, control)
    assert not json.loads(parity.ATTESTATION.read_text())["pass"]

    # chamfer 20% worse -> fail even with better psnr
    bad2 = {"method": "neus-facto-tpu", "psnr": 30.5, "chamfer_l1": 0.012,
            "iters": 20000}
    parity.write_attestation(bad2, control)
    assert not json.loads(parity.ATTESTATION.read_text())["pass"]


def test_attestation_isolated_from_repo_root(tmp_path, monkeypatch):
    parity = _load_parity(tmp_path, monkeypatch)
    # with SST_PARITY_DIR set, the attestation must NOT target the repo root
    assert parity.ATTESTATION.parent == tmp_path


@pytest.mark.slow
def test_parity_pipeline_e2e_smoke(tmp_path, monkeypatch):
    """The whole attestation pipeline on CPU: tiny DTU-like scene, both
    arms trained in 2 segments each (exercising checkpoint resume), PSNR +
    Chamfer evals, and a structurally complete PARITY.json. The child
    processes stay off the TPU via SST_JAX_PLATFORM (the deployment's
    sitecustomize overrides JAX_PLATFORMS, utils/platform.py)."""
    monkeypatch.setenv("SST_PARITY_DIR", str(tmp_path))
    monkeypatch.setenv("SST_PARITY_SCENE", "4,48")
    monkeypatch.setenv("SST_PARITY_RAYS", "64")
    monkeypatch.setenv("SST_PARITY_GEO_RES", "24")
    monkeypatch.setenv("SST_JAX_PLATFORM", "cpu")
    parity = _load_parity(tmp_path, monkeypatch)
    monkeypatch.setattr(sys, "argv", ["parity", "--iters", "4", "--segment", "2"])
    parity.main()

    rec = json.loads((tmp_path / "PARITY.json").read_text())
    assert {"pass", "preset", "control", "criteria", "holdout"} <= set(rec)
    assert rec["preset"]["iters"] == 4 and rec["control"]["iters"] == 4
    for arm in ("neus-facto", "neus-facto-tpu"):
        ckpts = sorted(
            p.name for p in (tmp_path / "runs" / "parity" / arm / "parity"
                             / "sdfstudio_models").glob("step-*")
        )
        assert "step-000000004" in ckpts, (arm, ckpts)


def test_stall_guard_kills_silent_child(tmp_path, monkeypatch):
    import time

    parity = _load_parity(tmp_path, monkeypatch)
    # a child that prints once then sleeps forever: must be killed at the
    # stall timeout, not waited on indefinitely
    t0 = time.time()
    rc = parity.run_with_stall_guard(
        [__import__("sys").executable, "-c",
         "import time; print('hello', flush=True); time.sleep(3600)"],
        env=None, stall_timeout=2.0,
    )
    assert rc == -9
    assert time.time() - t0 < 30

    # a healthy child that keeps printing runs to completion. Generous
    # timeout: on a loaded 1-CPU box interpreter startup alone can exceed
    # a small stall window (observed flake at 2.0s under 3 parallel jobs)
    rc = parity.run_with_stall_guard(
        [__import__("sys").executable, "-c",
         "import time\nfor i in range(3): print(i, flush=True); time.sleep(0.5)"],
        env=None, stall_timeout=30.0,
    )
    assert rc == 0


def test_eval_env_platform_flag(tmp_path, monkeypatch):
    """_eval_env routes eval subprocesses to an alternate JAX platform via
    env var or the late-binding flag file (flippable under a live driver)."""
    parity = _load_parity(tmp_path, monkeypatch)
    monkeypatch.delenv("SST_PARITY_EVAL_PLATFORM", raising=False)
    assert "SST_JAX_PLATFORM" not in parity._eval_env() or \
        parity._eval_env()["SST_JAX_PLATFORM"] == ""

    (tmp_path / "eval_platform.txt").write_text("cpu\n")
    assert parity._eval_env()["SST_JAX_PLATFORM"] == "cpu"

    # explicit env var outranks the flag file
    monkeypatch.setenv("SST_PARITY_EVAL_PLATFORM", "tpu")
    assert parity._eval_env()["SST_JAX_PLATFORM"] == "tpu"


def test_segmented_final_eval_flags_last_segment_only(tmp_path, monkeypatch):
    """run_segmented must pass --trainer.final-eval-* flags ONLY to the last
    segment child: an intermediate child's max-num-iterations IS its segment
    end, so forwarding them would run the full protocol eval at every
    segment boundary (scripts/train.py run_segmented)."""
    from sdfstudio_tpu.scripts import train as train_mod

    calls = []

    class _Ret:
        returncode = 0

    def fake_run(args, env=None, **kw):
        calls.append(args)
        return _Ret()

    monkeypatch.setattr(train_mod, "DATAPARSERS", {"sdfstudio-data": (object, object)})
    monkeypatch.setattr("subprocess.run", fake_run)
    argv = [
        "neus-facto-tpu",
        "--trainer.max-num-iterations", "4",
        "--trainer.final-eval-gt", "dtu-like",
        "--trainer.final-eval-output", str(tmp_path / "m.json"),
        "sdfstudio-data", "--data", str(tmp_path),
    ]
    config = train_mod.parse_args(argv)
    config.output_dir = tmp_path
    config.trainer = __import__("dataclasses").replace(
        config.trainer, max_num_iterations=4, steps_per_save=2
    )
    train_mod.run_segmented(argv, config)

    assert len(calls) == 2
    first, last = calls
    assert not any("final-eval" in t for t in first), first
    assert "--trainer.final-eval-gt" in last and "dtu-like" in last
    # flags must splice BEFORE the dataparser subcommand token
    assert last.index("--trainer.final-eval-gt") < last.index("sdfstudio-data")
