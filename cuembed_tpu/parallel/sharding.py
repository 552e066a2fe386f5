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
