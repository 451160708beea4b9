"""Packed checkpoints: one device->host transfer for the whole state.

Orbax fetches each array separately; on this deployment every transfer has
~29s flat latency, so a ~150-leaf train state would take ~an hour to save.
Here all float leaves are flattened and concatenated into ONE device array
(and ints into another), fetched in two transfers, and stored as npz +
structure JSON. The pack/unpack programs are tiny but DO count against the
runtime's program budget — call save only at segment boundaries / end of
run (see docs/tpu-design.md).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _leaf_meta(leaves):
    return [
        {"shape": list(np.shape(l)), "dtype": str(np.asarray(jnp.zeros((), l.dtype)).dtype)}
        for l in leaves
    ]


def save_packed(path: Path, tree: Any) -> None:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    float_idx = [i for i, l in enumerate(leaves) if jnp.issubdtype(l.dtype, jnp.floating)]
    other_idx = [i for i in range(len(leaves)) if i not in set(float_idx)]

    def pack(idxs, dtype):
        if not idxs:
            return np.zeros((0,), dtype)
        flat = jnp.concatenate([leaves[i].astype(dtype).reshape(-1) for i in idxs])
        return np.asarray(flat)  # ONE transfer

    floats = pack(float_idx, jnp.float32)
    others = pack(other_idx, jnp.int64 if jax.config.jax_enable_x64 else jnp.int32)

    np.savez(path / "packed.npz", floats=floats, others=others)
    meta = {
        "treedef": str(treedef),
        "num_leaves": len(leaves),
        "float_idx": float_idx,
        "other_idx": other_idx,
        "leaves": _leaf_meta(leaves),
    }
    (path / "structure.json").write_text(json.dumps(meta))


def load_packed(path: Path, template: Any) -> Any:
    """Restore into the structure of ``template`` (shapes must match)."""
    path = Path(path)
    data = np.load(path / "packed.npz")
    meta = json.loads((path / "structure.json").read_text())
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    assert len(t_leaves) == meta["num_leaves"], (
        f"checkpoint has {meta['num_leaves']} leaves, template has {len(t_leaves)}"
    )
    out = [None] * len(t_leaves)

    def unpack(idxs, flat):
        off = 0
        for i in idxs:
            size = int(np.prod(t_leaves[i].shape)) if np.ndim(t_leaves[i]) else 1
            chunk = flat[off : off + size].reshape(np.shape(t_leaves[i]))
            out[i] = jnp.asarray(chunk, t_leaves[i].dtype)
            off += size
        assert off == len(flat), (off, len(flat))

    unpack(meta["float_idx"], data["floats"])
    unpack(meta["other_idx"], data["others"])
    return jax.tree_util.tree_unflatten(treedef, out)
