"""Slope-time the grid-encoding cost block at exact train shapes.

The train step's dominant cost is the SDF grid encoding (forward gathers +
sort-based segment-add backward; see docs/tpu-design.md "Optimization
log"). This probe times that block in isolation at the shapes the
neus-facto-tpu preset uses (M = rays x neus samples points), for any
encoding/layout, so layout candidates (hash L8xF2, permuto, L4xF4, ...)
can be compared without compiling the full step.

Measured reference points (v5e, M=98304, hash L8 F2 2^19, f32):
  enc_fwd 33.7 ms | enc_jac_fwd 34.4 | enc_grad 90.5 | enc_jac_grad 116.4
i.e. the analytic jacobian is ~free on top of the forward (shared
gathers), and the backward's segment-add costs more than the forward.

Usage:
  python -m sdfstudio_tpu.scripts.benchmarking.probe_encoding \
      --encoding permuto --num-levels 8 --features 2 --points 98304
"""
from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoding", default="hash", choices=["hash", "permuto"])
    ap.add_argument("--points", type=int, default=2048 * 48,
                    help="query count M (rays x samples)")
    ap.add_argument("--num-levels", type=int, default=8)
    ap.add_argument("--features", type=int, default=2)
    ap.add_argument("--min-res", type=int, default=16)
    ap.add_argument("--max-res", type=int, default=512)
    ap.add_argument("--log2-hashmap", type=int, default=19)
    ap.add_argument("--table-dtype", default="float32")
    ap.add_argument("--scan-k", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "high")

    from sdfstudio_tpu.scripts.benchmarking.probe_prims import slope_time
    from sdfstudio_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    if args.encoding == "hash":
        from sdfstudio_tpu.ops.encodings import HashEncoding

        enc = HashEncoding(
            num_levels=args.num_levels, min_res=args.min_res,
            max_res=args.max_res, log2_hashmap_size=args.log2_hashmap,
            features_per_level=args.features, table_dtype=args.table_dtype,
        )
    else:
        from sdfstudio_tpu.ops.permuto import PermutoEncoding

        enc = PermutoEncoding(
            num_levels=args.num_levels, min_res=args.min_res,
            max_res=args.max_res, log2_hashmap_size=args.log2_hashmap,
            features_per_level=args.features, table_dtype=args.table_dtype,
        )

    M, K = args.points, args.scan_k
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (M, 3))
    params = enc.init(key, x)
    n_rows = sum(p.size for p in jax.tree_util.tree_leaves(params)) // args.features
    print(f"backend={jax.devices()[0].platform} encoding={args.encoding} "
          f"M={M} L={args.num_levels} F={args.features} rows={n_rows}",
          flush=True)

    def timed(name, fn):
        @jax.jit
        def run(p, x0):
            def step(carry, _):
                s, xx = carry
                xx = (xx + 0.001) % 1.0
                return (s + fn(p, xx), xx), None

            (s, _), _ = jax.lax.scan(step, (jnp.float32(0), x0), None, length=K)
            return s

        dt, spread = slope_time(lambda: float(run(params, x)))
        print(f"{name}: {dt / K * 1e3:.1f} ms/iter ({dt * 1e3:.0f} ms/call "
              f"{spread})", flush=True)

    def table_leaf(grads):
        return sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))

    timed("enc_fwd     ", lambda p, xx: jnp.sum(enc.apply(p, xx)))
    timed("enc_jac_fwd ", lambda p, xx: sum(
        jnp.sum(o) for o in enc.apply(p, xx, want_jac=True)))
    timed("enc_grad    ", lambda p, xx: table_leaf(jax.grad(
        lambda pp: jnp.sum(enc.apply(pp, xx)))(p)))

    def loss_jacused(pp, xx):
        # mimic the eikonal pattern: nonlinear use of the input-jacobian
        out, jac = enc.apply(pp, xx, want_jac=True)
        g = jnp.sum(jac, axis=1)
        eik = jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
        return eik + jnp.mean(out.astype(jnp.float32) ** 2)

    timed("enc_jac_grad", lambda p, xx: table_leaf(jax.grad(
        lambda pp: loss_jacused(pp, xx))(p)))


if __name__ == "__main__":
    main()
