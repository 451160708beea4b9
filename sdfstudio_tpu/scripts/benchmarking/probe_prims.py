"""Slope-probe TPU primitive rates that bound hash-grid training.

Motivation: the neus-facto train step is bound by random table accesses
(docs/tpu-design.md). This tool measures, with the honest slope protocol
(``jax.block_until_ready`` does not wait on this deployment; a device->host
readback does), the primitives the encode/backward are built from:

* row gather rate vs row width / dtype / table size / layout,
* the sort+cumsum segment-add (ops/scatter.py) vs native scatter-add,
* multi-operand ``lax.sort`` rate.

Each case runs as a K-iteration ``lax.scan`` whose carry consumes the
result (no DCE), timed over two call counts; rate = work / slope.

Usage:  python -m sdfstudio_tpu.scripts.benchmarking.probe_prims [--quick]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(fn, n_calls=7):
    """Median per-call time: fn must end with a device->host readback.

    Individual readbacks on the relay occasionally stall for seconds; the
    median over several calls is robust where a 2-point slope is not
    (observed: slope(1 vs 3 calls) produced negative deltas).
    """
    fn()  # compile
    fn()  # warm
    times = []
    for _ in range(n_calls):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    spread = f"[{min(times)*1e3:.0f}..{max(times)*1e3:.0f}]"
    return max(med, 1e-9), spread


def scanned(body, K):
    @jax.jit
    def run(x0):
        def step(carry, _):
            return body(carry), None

        out, _ = jax.lax.scan(step, x0, None, length=K)
        return jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out)

    return run


def probe_gather(M, R, F, dtype, K, axis, seed=0):
    key = jax.random.PRNGKey(seed)
    idx = jax.random.randint(key, (M,), 0, R, dtype=jnp.int32)
    if axis == 0:
        table = jnp.ones((R, F), dtype)

        def body(carry):
            t, s = carry
            g = jnp.take(t, idx + (s.astype(jnp.int32) % 2), axis=0)
            return (t, s + jnp.sum(g[:, 0].astype(jnp.float32))), None

    else:
        table = jnp.ones((F, R), dtype)

        def body(carry):
            t, s = carry
            g = jnp.take(t, idx + (s.astype(jnp.int32) % 2), axis=1)
            return (t, s + jnp.sum(g[0].astype(jnp.float32))), None

    @jax.jit
    def run(table):
        def step(carry, _):
            return body(carry)[0], None

        (t, s), _ = jax.lax.scan(step, (table, jnp.asarray(0.0)), None, length=K)
        return s

    def call():
        return float(run(table))

    dt, spread = slope_time(call)
    rate = M * K / dt
    print(
        f"gather M={M/1e6:.1f}M R=2^{int(np.log2(R))} F={F} {np.dtype(dtype).name}"
        f" axis={axis}: {rate/1e6:.0f}M rows/s ({dt*1e3:.0f} ms/call {spread}, K={K})",
        flush=True,
    )
    return rate


def probe_segment_add(M, R, F, K, kind):
    from sdfstudio_tpu.ops.scatter import sorted_segment_add

    key = jax.random.PRNGKey(1)
    idx = jax.random.randint(key, (M,), 0, R, dtype=jnp.int32)
    upd = jnp.ones((M, F), jnp.float32)

    if kind == "sorted":
        def body(s):
            out = sorted_segment_add(idx + (s.astype(jnp.int32) % 2), upd, R)
            return s + out[0, 0]
    else:
        def body(s):
            out = jnp.zeros((R, F), jnp.float32).at[
                idx + (s.astype(jnp.int32) % 2)
            ].add(upd)
            return s + out[0, 0]

    @jax.jit
    def run(x0):
        def step(carry, _):
            return body(carry), None

        s, _ = jax.lax.scan(step, x0, None, length=K)
        return s

    def call():
        return float(run(jnp.asarray(0.0)))

    dt, spread = slope_time(call)
    print(
        f"segadd[{kind}] M={M/1e6:.1f}M R=2^{int(np.log2(R))} F={F}: "
        f"{M*K/dt/1e6:.0f}M upd/s ({dt*1e3:.0f} ms/call {spread}, K={K})",
        flush=True,
    )


def probe_sort(M, n_payload, K):
    key = jax.random.PRNGKey(2)
    keys0 = jax.random.randint(key, (M,), 0, 1 << 20, dtype=jnp.int32)
    payloads = [jnp.ones((M,), jnp.float32) for _ in range(n_payload)]

    def body(s):
        out = jax.lax.sort(
            (keys0 + (s.astype(jnp.int32) % 2), *payloads), num_keys=1
        )
        return s + out[1][0] + out[0][0].astype(jnp.float32)

    @jax.jit
    def run(x0):
        def step(carry, _):
            return body(carry), None

        s, _ = jax.lax.scan(step, x0, None, length=K)
        return s

    def call():
        return float(run(jnp.asarray(0.0)))

    dt, spread = slope_time(call)
    print(
        f"sort M={M/1e6:.1f}M payloads={n_payload}: {M*K/dt/1e6:.0f}M keys/s "
        f"({dt*1e3:.0f} ms/call {spread}, K={K})",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None, help="gather|segadd|sort")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)

    M = 4_194_304  # 4M queries
    K = 8 if not args.quick else 4

    if args.only in (None, "gather"):
        R = 1 << 23  # 8.4M rows (the stacked L16 2^19 table)
        for F in (1, 2, 4, 8, 16, 32):
            probe_gather(M, R, F, jnp.float32, K, axis=0)
        probe_gather(M, R, 2, jnp.bfloat16, K, axis=0)
        probe_gather(M, R, 16, jnp.bfloat16, K, axis=0)
        probe_gather(M, R, 2, jnp.float32, K, axis=1)  # SOA (current layout)
        probe_gather(M, 1 << 17, 2, jnp.float32, K, axis=0)  # small table
        probe_gather(M, 1 << 14, 2, jnp.float32, K, axis=0)  # VMEM-size table
        probe_gather(M, 1 << 19, 8, jnp.float32, K, axis=0)  # plane-ish
    if args.only in (None, "segadd"):
        probe_segment_add(M, 1 << 23, 2, max(K // 2, 2), "sorted")
        probe_segment_add(M, 1 << 19, 2, max(K // 2, 2), "sorted")
        if not args.quick:
            probe_segment_add(M, 1 << 19, 2, 2, "native")
    if args.only in (None, "sort"):
        probe_sort(M, 1, K)
        probe_sort(M, 3, K)
        probe_sort(12_582_912, 3, max(K // 2, 2))


if __name__ == "__main__":
    main()
