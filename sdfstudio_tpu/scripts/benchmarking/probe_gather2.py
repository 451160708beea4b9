"""Round-3 gather-strategy probes: can anything beat the XLA single-row
gather floor (~162M rows/s, docs/tpu-design.md)?

Candidates, each slope-timed (enqueue -> device->host readback; see
probe_prims.slope_time for why block_until_ready is not honest here):

  xla1      single-row gather, [R, F] table, axis=0 (status quo baseline)
  xla-soa   column gather from [F, R] (the layout table_gather uses today)
  pair      lax.gather with slice_sizes=(2, F): the additive-x hash makes
            the two x-corners CONSECUTIVE rows, so 8 corners = 4 two-row
            slices — half the random accesses, double the bytes each
  quad      lax.gather slice_sizes=(4, F) — stride-2 y-packing would give
            4 consecutive rows per (x,y) corner pair
  onehot    one-hot MXU gather for SMALL tables: out = onehot(idx) @ table;
            cost M*R*F MACs on the MXU + M*R compares on the VPU — viable
            only for R <= ~2^12, probed to size a small-table preset
  pl-take   Pallas kernel, table VMEM-resident, jnp.take inside the kernel
            (may not lower; mosaic gather support is version-dependent)
  pl-loop   Pallas kernel, scalar fori_loop of dynamic row reads from a
            VMEM-resident table (issue-rate bound; quantifies the ceiling)

Usage: python -m sdfstudio_tpu.scripts.benchmarking.probe_gather2 \
          [--only xla1,pair,...] [--quick]
"""
from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from sdfstudio_tpu.scripts.benchmarking.probe_prims import slope_time


def _scan_rate(body, K, work, label):
    """body: carry(float) -> carry. Rate = work*K/slope."""

    @jax.jit
    def run(x0):
        def step(c, _):
            return body(c), None

        s, _ = jax.lax.scan(step, x0, None, length=K)
        return s

    def call():
        return float(run(jnp.asarray(0.0)))

    try:
        dt, spread = slope_time(call)
    except Exception as e:  # noqa: BLE001 — probe must report, not die
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None
    rate = work * K / dt
    print(f"{label}: {rate/1e6:.0f}M rows/s ({dt*1e3:.1f} ms/call {spread}, K={K})",
          flush=True)
    return rate


def probe_xla1(M, R, F, K, dtype=jnp.float32):
    idx = jax.random.randint(jax.random.PRNGKey(0), (M,), 0, R, jnp.int32)
    table = jnp.ones((R, F), dtype)

    def body(s):
        g = jnp.take(table, idx + (s.astype(jnp.int32) % 2), axis=0)
        return s + jnp.sum(g[:, 0].astype(jnp.float32))

    _scan_rate(body, K, M,
               f"xla1 M={M/1e6:.1f}M R=2^{int(np.log2(R))} F={F} {np.dtype(dtype).name}")


def probe_pair(M, R, F, K, slice_rows=2, dtype=jnp.float32):
    """lax.gather of [slice_rows, F] slices at random starts."""
    n_slices = M // slice_rows
    starts = jax.random.randint(
        jax.random.PRNGKey(0), (n_slices, 1), 0, R - slice_rows, jnp.int32
    )
    table = jnp.ones((R, F), dtype)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,),
    )

    def body(s):
        g = jax.lax.gather(
            table,
            starts + (s.astype(jnp.int32) % 2),
            dnums,
            slice_sizes=(slice_rows, F),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # [n_slices, slice_rows, F]
        return s + jnp.sum(g[:, 0, 0].astype(jnp.float32))

    _scan_rate(
        body, K, M,
        f"pair[{slice_rows}] M={M/1e6:.1f}M R=2^{int(np.log2(R))} F={F} "
        f"{np.dtype(dtype).name} ({n_slices/1e6:.1f}M slices)",
    )


def probe_onehot(M, R, F, K, block=512, dtype=jnp.bfloat16):
    """Gather as sum of block-wise one-hot matmuls: rows/s for small R."""
    idx = jax.random.randint(jax.random.PRNGKey(0), (M,), 0, R, jnp.int32)
    table = jnp.ones((R, F), dtype)
    cols = jnp.arange(R, dtype=jnp.int32)

    def body(s):
        i = idx + (s.astype(jnp.int32) % 2)
        oh = (i[:, None] == cols[None, :]).astype(dtype)  # [M, R]
        g = jnp.dot(oh, table, preferred_element_type=jnp.float32)  # [M, F]
        return s + jnp.sum(g[:, 0])

    _scan_rate(body, K, M, f"onehot M={M/1e6:.1f}M R=2^{int(np.log2(R))} F={F}")


def probe_pallas_take(M, R, F, K, dtype=jnp.float32):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = 2048  # rows gathered per grid step

    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    @functools.partial(jax.jit, static_argnames=())
    def gather(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(M // B,),
            in_specs=[
                pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, F), dtype),
        )(idx, table)

    idx = jax.random.randint(jax.random.PRNGKey(0), (M,), 0, R, jnp.int32)
    table = jnp.ones((R, F), dtype)

    def body(s):
        g = gather(table, idx + (s.astype(jnp.int32) % 2))
        return s + jnp.sum(g[:, 0].astype(jnp.float32))

    _scan_rate(body, K, M, f"pl-take M={M/1e6:.1f}M R=2^{int(np.log2(R))} F={F}")


def probe_pallas_loop(M, R, F, K, dtype=jnp.float32):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = 1024

    def kernel(idx_ref, table_ref, out_ref):
        def tap(i, _):
            out_ref[i, :] = table_ref[idx_ref[i], :]
            return 0

        jax.lax.fori_loop(0, B, tap, 0)

    @jax.jit
    def gather(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(M // B,),
            in_specs=[
                pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((R, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, F), dtype),
        )(idx, table)

    idx = jax.random.randint(jax.random.PRNGKey(0), (M,), 0, R, jnp.int32)
    table = jnp.ones((R, F), dtype)

    def body(s):
        g = gather(table, idx + (s.astype(jnp.int32) % 2))
        return s + jnp.sum(g[:, 0].astype(jnp.float32))

    _scan_rate(body, K, M, f"pl-loop M={M/1e6:.1f}M R=2^{int(np.log2(R))} F={F}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    only = args.only.split(",") if args.only else None
    from sdfstudio_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    print(f"backend={jax.default_backend()}", flush=True)

    M = 4_194_304
    K = 4 if args.quick else 8

    def want(name):
        return only is None or name in only

    if want("xla1"):
        probe_xla1(M, 1 << 19, 2, K)
        probe_xla1(M, 1 << 14, 2, K)  # VMEM-sized table: is XLA faster?
        probe_xla1(M, 1 << 19, 4, K)
        probe_xla1(M, 1 << 19, 8, K)
    if want("pair"):
        probe_pair(M, 1 << 19, 2, K, slice_rows=2)
        probe_pair(M, 1 << 19, 2, K, slice_rows=4)
        probe_pair(M, 1 << 19, 4, K, slice_rows=2)
        probe_pair(M, 1 << 19, 2, K, slice_rows=2, dtype=jnp.bfloat16)
    if want("onehot"):
        probe_onehot(M // 4, 1 << 11, 2, max(K // 2, 2))
        probe_onehot(M // 4, 1 << 12, 2, max(K // 2, 2))
        probe_onehot(M // 4, 1 << 13, 2, 2)
    if want("pl-take"):
        probe_pallas_take(M, 1 << 14, 2, K)
        probe_pallas_take(M, 1 << 19, 2, K)
    if want("pl-loop"):
        probe_pallas_loop(1 << 20, 1 << 14, 2, 2)


if __name__ == "__main__":
    main()
