"""TPU-fast scatter-add via sort + cumsum (dense segment-sum).

XLA's native scatter-add on TPU executes ~15M updates/s regardless of
``indices_are_sorted`` (measured; see docs/tpu-design.md "Honest throughput
status"), which made hash-grid gradients the dominant cost of training.
The primitives this routine is built from are fast on TPU (measured on
v5e): argsort ~320M keys/s, row gather ~160M rows/s, cumsum ~bandwidth.

Algorithm (sorted-COO -> dense without any scatter):
  1. one merged key sort of [updates ++ row-queries 0..R-1], stable by
     (value, updates-before-query) via ``key = value*2 + is_query``;
  2. cumulative sum of the permuted update values (queries contribute 0);
  3. position of query r in the sorted merge (via argsort of the
     permutation = its inverse) gives ``count(idx <= r)``, so the dense
     row total is an adjacent difference of the cumsum gathered at query
     positions.

Replaces the transpose (VJP) of the hash-encoding table gather — the
reference hits the same primitive through tcnn's CUDA atomic scatter
(reference encodings.py:357-398 backward).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sorted_segment_add(idx: jnp.ndarray, upd: jnp.ndarray, num_rows: int) -> jnp.ndarray:
    """Equivalent of ``jnp.zeros((num_rows, F)).at[idx].add(upd)``.

    Args:
        idx: [M] int32 row indices in [0, num_rows).
        upd: [M, F] update rows.
    Returns:
        [num_rows, F] dense accumulation.
    """
    M = idx.shape[0]
    F = upd.shape[-1]
    R = num_rows
    dtype = upd.dtype

    # merged sort: update keys even, query keys odd -> for equal value the
    # updates come first, so a query's sorted position counts idx <= r.
    keys = jnp.concatenate(
        [idx.astype(jnp.int32) * 2, jnp.arange(R, dtype=jnp.int32) * 2 + 1]
    )
    # co-sort the value columns with the keys (multi-operand lax.sort):
    # a separate argsort + take would add an [M+R, F] permutation gather,
    # which costs as much as the sort itself at hash-grid sizes.
    iota = jnp.arange(M + R, dtype=jnp.int32)
    vals = jnp.concatenate([upd, jnp.zeros((R, F), dtype)], axis=0)
    sorted_ops = jax.lax.sort(
        (keys, iota, *(vals[:, f] for f in range(F))), num_keys=1
    )
    order = sorted_ops[1]
    svals = jnp.stack(sorted_ops[2:], axis=-1)  # [M+R, F]
    inv = jnp.argsort(order)  # inverse permutation (argsort of a permutation)
    csum = jnp.cumsum(svals, axis=0)  # [M+R, F]

    pos_q = inv[M:]  # [R] position of query r in the merge
    # cumulative total through row r: csum at the element just before the
    # query (queries themselves add 0, so csum[pos_q] works directly and
    # handles pos_q == 0 rows via the query's own zero contribution).
    acc = jnp.take(csum, pos_q, axis=0)  # [R, F]
    prev = jnp.concatenate([jnp.zeros((1, F), dtype), acc[:-1]], axis=0)
    return acc - prev
