"""Aggregate a jax.profiler device trace into a per-op cost table.

Consumes the ``<dir>/plugins/profile/<ts>/*.trace.json.gz`` written by
``probe_step --trace`` (utils/profiler.py::jax_trace) and attributes wall
time on the TPU device track to XLA op categories, so the "non-gather
floor" of the train step can be itemized instead of guessed at
(docs/tpu-design.md "Round-4 state"; the reference's equivalent is
torch.profiler tables driven by nerfstudio/utils/profiler.py:52-77).

Usage:
    python -m sdfstudio_tpu.scripts.benchmarking.trace_report \
        .parity/trace_preset [--top 30] [--steps N]

With --steps N the totals are also reported per train step (the capture
window of probe_step --trace covers calls*K steps).
"""
from __future__ import annotations

import argparse
import collections
import gzip
import json
import re
from pathlib import Path

# XLA emits fused computations named e.g. "fusion.123", "gather.45",
# "sort.7"; strip the instance suffix so costs aggregate by kind+shape
# context rather than by unique instruction.
_SUFFIX = re.compile(r"[.\-_]?\d+$")


def _category(name: str) -> str:
    base = _SUFFIX.sub("", name.split("/")[-1]).lower()
    for key in ("gather", "scatter", "sort", "dot", "conv", "cumsum",
                "reduce-window", "all-reduce", "copy", "transpose",
                "dynamic-slice", "dynamic-update-slice", "rng",
                "infeed", "outfeed", "select-and-scatter"):
        if key in base:
            return key
    if "fusion" in base:
        return "fusion"
    return base or name


def load_events(trace_dir: Path) -> list[dict]:
    files = sorted(trace_dir.rglob("*.trace.json.gz"))
    if not files:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(files[-1], "rt") as f:
        return json.load(f).get("traceEvents", [])


def device_pid(events: list[dict]) -> int | None:
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))):
            return e["pid"]
    return None


def report(trace_dir: Path, top: int = 30, steps: int | None = None) -> list[tuple]:
    events = load_events(trace_dir)
    pid = device_pid(events)
    if pid is None:
        raise SystemExit("no TPU device track in trace (host-only capture?)")
    by_cat = collections.Counter()
    by_name = collections.Counter()
    by_src = collections.Counter()
    n_ev = 0
    for e in events:
        if e.get("pid") != pid or e.get("ph") != "X":
            continue
        dur = e.get("dur", 0)  # microseconds
        name = e.get("name", "?")
        cat = _category(name)
        by_cat[cat] += dur
        by_name[name] += dur
        # leaf ops only for the source rollup: while/jit wrappers nest their
        # children and would double-count the enclosed time
        if cat not in ("while", "jit") and not name.startswith("jit"):
            src = str(e.get("args", {}).get("source", "?"))
            by_src[src.replace("/root/repo/", "")] += dur
        n_ev += 1
    total = sum(by_cat.values())
    print(f"device events: {n_ev}   device-busy total: {total/1e3:.1f} ms")
    scale = f" ({1/steps:.4f} steps^-1)" if steps else ""
    print(f"\n== by category (us; per-capture{scale}) ==")
    rows = by_cat.most_common(top)
    for cat, dur in rows:
        per = f"  {dur/steps/1e3:8.2f} ms/step" if steps else ""
        print(f"  {cat:28s} {dur/1e3:10.1f} ms  {100*dur/total:5.1f}%{per}")
    print(f"\n== top individual ops ==")
    for name, dur in by_name.most_common(top):
        per = f"  {dur/steps/1e3:8.2f} ms/step" if steps else ""
        print(f"  {name[:70]:70s} {dur/1e3:9.1f} ms{per}")
    print(f"\n== by source line (leaf ops) ==")
    for src, dur in by_src.most_common(top):
        per = f"  {dur/steps/1e3:8.2f} ms/step" if steps else ""
        print(f"  {src[:70]:70s} {dur/1e3:9.1f} ms{per}")
    return rows


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir", type=Path)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--steps", type=int, default=None,
                    help="train steps inside the capture (calls * K)")
    args = ap.parse_args()
    report(args.trace_dir, args.top, args.steps)


if __name__ == "__main__":
    main()
