"""Mesh construction and sharding specs for embedding workloads.

Canonical layout: a 2D mesh ``(data, model)``. Embedding tables shard
row-wise over ``model`` (each chip owns a contiguous row range), the
training batch shards over ``data``, dense-tower parameters replicate.
Collectives ride ICI: ``psum`` over ``model`` for pooled embeddings,
gradient reductions over ``data``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_model: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    ``n_model`` defaults to the largest power-of-two divisor of the device
    count up to 8 — enough model shards to spread tables, the rest data
    parallel.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_model is None:
        # Balanced split: model gets the (larger) half of the power-of-two
        # factorization — 2->(1,2), 4->(2,2), 8->(2,4), 16->(4,4).
        k = 0
        while n % (1 << (k + 1)) == 0:
            k += 1
        n_model = 1 << ((k + 1) // 2)
    if n % n_model != 0:
        raise ValueError(f"{n} devices not divisible by n_model={n_model}")
    arr = np.array(devices).reshape(n // n_model, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def table_sharding(mesh: Mesh, *, column: bool = False) -> NamedSharding:
    """Row-sharded (default) or column-sharded table placement."""
    spec = P(None, MODEL_AXIS) if column else P(MODEL_AXIS, None)
    return NamedSharding(mesh, spec)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-major arrays shard over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def pad_table_for_shards(table: jax.Array, n_shards: int) -> jax.Array:
    """Pad rows so the table divides evenly across ``n_shards``."""
    v = table.shape[0]
    padded = (v + n_shards - 1) // n_shards * n_shards
    if padded != v:
        table = jnp.pad(table, ((0, padded - v), (0, 0)))
    return table


def shard_csr(
    indices: np.ndarray,
    offsets: np.ndarray,
    n_shards: int,
    weights: Optional[np.ndarray] = None,
    *,
    cap: Optional[int] = None,
):
    """Split a global CSR batch into the *sharded-CSR* layout.

    A flat CSR batch cannot shard along the data axis directly (offset
    values are global), so the data-parallel layout re-bases it per
    shard: ``indices [n_shards, cap]`` (zero-padded value blocks),
    ``offsets [n_shards, local_batch + 1]``, ``weights`` like indices.
    Feed the blocks sharded ``P(data, None)`` to
    :func:`cuembed_tpu.parallel.sharded_lookup.row_sharded_lookup` or
    :func:`cuembed_tpu.parallel.alltoall_lookup.alltoall_row_sharded_lookup`.

    ``cap`` (static per-shard value capacity) defaults to the largest
    shard's nonzero count, rounded up to 8.

    Returns ``(indices_blocks, offsets_blocks, weights_blocks | None)``.
    """
    offsets = np.asarray(offsets)
    indices = np.asarray(indices)
    batch = offsets.shape[0] - 1
    if batch % n_shards != 0:
        raise ValueError("batch must divide evenly across shards")
    lb = batch // n_shards
    bounds = offsets[:: lb]  # [n_shards + 1] sample-group boundaries
    per_shard_nnz = bounds[1:] - bounds[:-1]
    if cap is None:
        cap = max(8, -(-int(per_shard_nnz.max()) // 8) * 8)
    idx_blocks = np.zeros((n_shards, cap), indices.dtype)
    off_blocks = np.zeros((n_shards, lb + 1), offsets.dtype)
    w_blocks = (
        np.zeros((n_shards, cap), np.asarray(weights).dtype)
        if weights is not None
        else None
    )
    for s in range(n_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        k = hi - lo
        if k > cap:
            raise ValueError(f"shard {s} needs {k} slots > cap {cap}")
        idx_blocks[s, :k] = indices[lo:hi]
        off_blocks[s] = offsets[s * lb : (s + 1) * lb + 1] - lo
        if w_blocks is not None:
            w_blocks[s, :k] = np.asarray(weights)[lo:hi]
    return idx_blocks, off_blocks, w_blocks
