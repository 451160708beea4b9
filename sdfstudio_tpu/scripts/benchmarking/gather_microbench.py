"""Microbenchmark: XLA row-gather rate vs table size and row width on TPU.

Decides the next perf rung for the hash-encoding hot path: if rows/s is
flat in row width F, the encoding should use fewer-but-wider gathers
(L8xF4 over L16xF2 — already the neus-facto-tpu preset); if small tables
gather much faster than 8M-row ones, dense low-res feature grids should
replace hash levels where possible.

Honest-timing protocol (docs/tpu-design.md): the relay's block_until_ready
does not wait, so each measurement enqueues CALLS scanned programs and ends
with a device->host readback; two call counts give a slope. One process per
config (the device program cache fits ~one executable).

Usage:
    python scripts/benchmarking/gather_microbench.py            # all configs
    python scripts/benchmarking/gather_microbench.py --child T F K CALLS
"""
from __future__ import annotations

import json
import subprocess
import sys
import time

N_IDX = 4_194_304  # gathered rows per step (~= one neus-facto fwd's accesses)
K = 10             # scan length per dispatched program


def child(table_rows: int, row_width: int, k: int, calls: int, dtype: str,
          layout: str = "aos"):
    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    if layout == "soa":  # the HashEncoding layout: take(table[F, T], idx, axis=1)
        table = jnp.ones((row_width, table_rows), dt)
    else:
        table = jnp.ones((table_rows, row_width), dt)
    idx = jax.random.randint(jax.random.PRNGKey(0), (N_IDX,), 0, table_rows)

    def step(acc, _):
        # fold acc into indices so scan iterations can't be CSE'd away
        i = (idx + acc.astype(jnp.int32)) % table_rows
        vals = jnp.take(table, i, axis=1 if layout == "soa" else 0)
        return vals.sum(dtype=jnp.float32), None

    @jax.jit
    def run(acc):
        out, _ = jax.lax.scan(step, acc, None, length=k)
        return out

    acc = run(jnp.float32(0.0))
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    for _ in range(calls):
        acc = run(acc)
    val = float(acc)  # real readback
    dt_s = time.perf_counter() - t0
    print(f"CHILD total={dt_s:.3f} val={val}", flush=True)


def run_child(table_rows, row_width, calls, dtype, layout):
    out = subprocess.run(
        [sys.executable, __file__, "--child", str(table_rows), str(row_width),
         str(K), str(calls), dtype, layout],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHILD"):
            return float(line.split("total=")[1].split()[0])
    print(out.stdout[-1500:], out.stderr[-1500:], file=sys.stderr)
    raise RuntimeError("child failed")


def measure(table_rows, row_width, dtype="f32", layout="aos"):
    t1 = run_child(table_rows, row_width, 1, dtype, layout)
    t2 = run_child(table_rows, row_width, 11, dtype, layout)
    per_step = max(t2 - t1, 1e-9) / (10 * K)
    rate = N_IDX / per_step
    print(json.dumps({
        "table_rows": table_rows, "row_width": row_width, "dtype": dtype,
        "layout": layout,
        "ms_per_gather": round(per_step * 1e3, 2),
        "rows_per_sec_M": round(rate / 1e6, 1),
    }), flush=True)
    return rate


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    if only == "widths":       # does rate scale with row width?
        for width in (2, 4, 8, 16, 32):
            measure(1 << 19, width, layout="soa")
        return
    if only == "sizes":        # does a VMEM-sized table gather faster?
        for rows in (1 << 12, 1 << 15, 1 << 18, 1 << 21, 1 << 23):
            measure(rows, 4, layout="soa")
        return
    if only == "bf16":
        measure(1 << 19, 2, "bf16", "soa")
        measure(1 << 19, 8, "bf16", "soa")
        measure(1 << 19, 2, "f32", "soa")
        measure(1 << 19, 8, "f32", "soa")
        return
    for rows in (1 << 15, 1 << 18, 1 << 21, 1 << 23):
        for width in (2, 4, 8, 16):
            measure(rows, width)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
              int(sys.argv[5]), sys.argv[6],
              sys.argv[7] if len(sys.argv) > 7 else "aos")
    else:
        main()
