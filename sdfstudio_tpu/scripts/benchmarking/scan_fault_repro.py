"""Bisect the scan-K>16 compiler fault to a minimal program fragment.

Scanning the full neus-facto train step with ``lax.scan`` length K>=16
faults this TPU deployment's compiler ("TPU device error"), while K<=10
works (docs/tpu-design.md; engine/trainer.py steps_per_call). The
neus-facto-tpu preset compiles at K=25, so the fault tracks program
content, not just scan length. This tool scans progressively SIMPLER
fragments of the neus-facto step at a given K — each in a fresh
subprocess, because a compiler fault can poison the parent's TPU client —
and reports the smallest fragment that still faults.

Fragment ladder (each includes the optimizer update over its params):
  full       the real train step (loss = full get_loss_dict)
  noprop     proposal sampling replaced by uniform samples (no proposal nets)
  fieldonly  SDF field forward + eikonal grad on fixed sample positions
  encmlp     geonetwork (hash encode + geo MLP) on fixed positions, L2 loss
  enc        hash encode alone on fixed positions, L2 loss
  mlp        geo-MLP-sized plain MLP alone, L2 loss

Usage (on the TPU backend):
    python -m sdfstudio_tpu.scripts.benchmarking.scan_fault_repro \
        [--k 25] [--fragments full,noprop,fieldonly,encmlp,enc,mlp]
"""
from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

FRAGMENTS = ["full", "noprop", "fieldonly", "encmlp", "enc", "mlp"]


def _make_fragment(name: str, k: int):
    """Build (init_carry, scanned_body) for the fragment."""
    import dataclasses
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import optax

    from sdfstudio_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    if name in ("full", "noprop"):
        from sdfstudio_tpu.data.synthetic import generate_sphere_dataset
        from sdfstudio_tpu.engine.setup import setup_trainer
        from sdfstudio_tpu.scripts.train import parse_args

        data_dir = Path(tempfile.gettempdir()) / "sst_bench_sphere_384_49"
        if not (data_dir / "meta_data.json").exists():
            generate_sphere_dataset(data_dir, num_images=49, width=384, height=384,
                                    with_mono_prior=False, with_fg_mask=False)
        config = parse_args(["neus-facto", "sdfstudio-data", "--data", str(data_dir)])
        config.datamanager = dataclasses.replace(
            config.datamanager, train_num_rays_per_batch=2048
        )
        if name == "noprop":
            config.model = dataclasses.replace(
                config.model,
                num_proposal_samples_per_ray=(),
                proposal_net_args_list=(),
                num_proposal_iterations=0,
            )
        config.output_dir = Path(tempfile.gettempdir()) / "sst_scan_fault_out"
        config.timestamp = "probe"
        config.vis = "none"
        trainer = setup_trainer(config, test_mode=True)
        trainer.setup(jax.random.PRNGKey(0))
        return lambda: trainer._train_multi(trainer.state, k)

    # standalone fragments: SDF field pieces on fixed positions
    import os

    from sdfstudio_tpu.configs.methods import method_configs
    from sdfstudio_tpu.fields.sdf_field import SDFFieldNet

    cfg = method_configs["neus-facto"].model.sdf_field
    # rays x samples of the real step; shrink via env for CPU trace checks
    n_pts = int(os.environ.get("SST_REPRO_PTS", 2048 * 128))
    x = jax.random.uniform(jax.random.PRNGKey(1), (n_pts, 3), minval=-0.8, maxval=0.8)

    if name == "mlp":
        import flax.linen as nn

        class Plain(nn.Module):
            @nn.compact
            def __call__(self, p):
                h = p
                for _ in range(2):
                    h = nn.Dense(256)(h)
                    h = nn.softplus(h)
                return nn.Dense(257)(h)

        mod = Plain()
        params = mod.init(jax.random.PRNGKey(2), x[:8])

        def loss_fn(params):
            return jnp.mean(mod.apply(params, x) ** 2)
    else:
        net = SDFFieldNet(config=cfg, num_images=49)
        params = net.init(jax.random.PRNGKey(2), jnp.zeros((8, 3)))

        if name == "enc":
            def loss_fn(params):
                feat, _ = net.apply(
                    params, x, None, False, method=SDFFieldNet._grid_feature
                )
                return jnp.mean(feat.astype(jnp.float32) ** 2)
        elif name == "encmlp":
            def loss_fn(params):
                h = net.apply(params, x, method=SDFFieldNet.geonetwork)
                return jnp.mean(h[..., 0] ** 2)
        else:  # fieldonly: geonetwork + eikonal input-gradients
            def loss_fn(params):
                h, grad = net.apply(
                    params, x, method=SDFFieldNet.geonetwork_with_gradient
                )
                eik = jnp.mean((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2)
                return jnp.mean(h[..., 0] ** 2) + 0.1 * eik

    tx = optax.adam(5e-4)
    opt_state = tx.init(params)

    def run():
        def body(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        @jax.jit
        def multi(carry):
            return jax.lax.scan(body, carry, None, length=k)

        (params2, _), losses = multi((params, opt_state))
        return params2, losses

    return run


def child(name: str, k: int) -> None:
    import jax

    run = _make_fragment(name, k)
    out = run()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    import numpy as np

    leaf = np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[-1]
    print(f"FRAG_OK name={name} k={k} last={leaf:.5f}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--k", type=int, default=25)
    ap.add_argument("--fragments", default=",".join(FRAGMENTS))
    ap.add_argument("--timeout", type=int, default=2400)
    args = ap.parse_args()
    results = {}
    for name in args.fragments.split(","):
        print(f"probing fragment={name} K={args.k} ...", flush=True)
        try:
            # the child runs `python <this file>`, whose sys.path[0] is the
            # benchmarking/ dir — put the repo root on PYTHONPATH so
            # sdfstudio_tpu imports without an installed package
            import os

            repo = Path(__file__).resolve().parents[3]
            env = dict(os.environ)
            env["PYTHONPATH"] = f"{repo}:{env.get('PYTHONPATH', '')}"
            out = subprocess.run(
                [sys.executable, __file__, "--child", name, str(args.k)],
                capture_output=True, text=True, timeout=args.timeout,
                cwd=repo, env=env,
            )
            ok = any(l.startswith("FRAG_OK") for l in out.stdout.splitlines())
            results[name] = "ok" if ok else "FAULT"
            if not ok:
                print((out.stderr or out.stdout)[-600:], flush=True)
        except subprocess.TimeoutExpired:
            results[name] = "TIMEOUT"
        print(f"fragment={name}: {results[name]}", flush=True)
    print("\nsummary:", results, flush=True)
    faulting = [n for n, r in results.items() if r != "ok"]
    if faulting:
        print(f"smallest faulting fragment: {faulting[-1]}", flush=True)
    else:
        print(f"no fragment faults at K={args.k} — fault needs the full step",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]))
    else:
        main()
