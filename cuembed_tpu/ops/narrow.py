"""Line-packed storage for narrow embedding tables (width < 128 lanes).

TPU arrays tile to 128 lanes; a ``[V, 32]`` table wastes 3/4 of every
fetched tile line, and measured random-gather throughput drops ~3.5x
(28 M rows/s vs ~100 M at 128 lanes on v5e — ``docs/PERF_NOTES.md``).
The reference's sweep includes width 32 (``sweep_parameters.sh``), so
narrow tables are first-class here:

* :func:`pack_narrow` stores ``k = 128 // width`` logical rows per
  128-lane line — memory-neutral, full-rate gathers.
* :func:`narrow_lookup` gathers the line of each index (``idx // k``)
  and selects the sub-row (``idx % k``) with a vectorized mask-reduce —
  ~81 M rows/s measured, 2.9x over the naive narrow gather.

Fully differentiable (autodiff transposes the gather/select back onto
the packed layout). ``EmbeddingBag(layout="packed")`` wires this in.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from cuembed_tpu.ops.transforms import extract_row_ids_from_csr
from cuembed_tpu.types import CombineMode, accumulation_dtype

LANES = 128


def packing_factor(width: int) -> int:
    """Logical rows per 128-lane line (1 => packing is a no-op)."""
    if width >= LANES or LANES % width != 0:
        return 1
    return LANES // width


def pack_narrow(table: jax.Array) -> jax.Array:
    """``[V, W]`` -> ``[ceil(V/k), k*W]`` with k rows per line."""
    v, w = table.shape
    k = packing_factor(w)
    if k == 1:
        return table
    pad = (-v) % k
    if pad:
        table = jnp.pad(table, ((0, pad), (0, 0)))
    return table.reshape(-1, k * w)


def unpack_narrow(packed: jax.Array, num_categories: int, width: int) -> jax.Array:
    """Inverse of :func:`pack_narrow`."""
    k = packing_factor(width)
    if k == 1:
        return packed
    return packed.reshape(-1, width)[:num_categories]


@partial(
    jax.jit,
    static_argnames=(
        "num_categories", "width", "mode", "low_precision_math", "tiered_cfg",
    ),
)
def narrow_lookup(
    packed: jax.Array,
    num_categories: int,
    width: int,
    indices: jax.Array,
    weights: Optional[jax.Array] = None,
    offsets: Optional[jax.Array] = None,
    *,
    mode: CombineMode = CombineMode.SUM,
    low_precision_math: bool = False,
    tiered_cfg=None,
) -> jax.Array:
    """Pooled lookup against a line-packed narrow table.

    Same contract as :func:`cuembed_tpu.ops.api.embedding_lookup` /
    ``_csr`` for SUM/MEAN/weighted (CONCAT: gather lines then select —
    also supported).

    ``tiered_cfg``: a :class:`cuembed_tpu.ops.tiered.TieredConfig` in
    *logical-row* units (``auto_config`` on the logical ``[V, W]``
    shape). When set and the call is fixed-hotness SUM/MEAN, lines are
    served by the 3-tier engine (VMEM-resident hot lines hold ``k``
    logical rows each — k x the coverage of a lane-padded layout for the
    same VMEM bytes). Requires frequency-remapped indices, like every
    tiered path. CSR/CONCAT ignore it (plain packed gather).
    """
    if weights is not None and mode != CombineMode.SUM:
        raise ValueError("weights are only supported with CombineMode.SUM")
    k = packing_factor(width)
    if (
        tiered_cfg is not None
        and offsets is None
        and mode != CombineMode.CONCAT
        and tiered_cfg.mxu_head_rows > 0
    ):
        from cuembed_tpu.ops.tiered import tiered_forward

        return tiered_forward(
            packed, indices, None, weights, mode=mode, cfg=tiered_cfg,
            low_precision_math=low_precision_math, pack_k=k,
        )
    acc_dt = accumulation_dtype(packed.dtype, low_precision_math)

    # Weight / MEAN coefficients come from the shared helper
    # (ops/tiered._combine_coeff — one place for combine semantics);
    # only the CSR liveness mask is layout-local here.
    from cuembed_tpu.ops.tiered import _combine_coeff

    coeff = _combine_coeff(indices, weights, offsets, mode, acc_dt)
    coeff = coeff.reshape(-1)
    if offsets is None:
        batch, hotness = indices.shape
        flat = indices.reshape(-1).astype(jnp.int32)
        n = flat.shape[0]
        sample = None
    else:
        if mode == CombineMode.CONCAT:
            raise ValueError("CSR does not support CONCAT")
        batch = offsets.shape[0] - 1
        n = indices.shape[0]
        pos = jnp.arange(n, dtype=jnp.int32)
        live = pos < offsets[-1]
        flat = jnp.where(live, indices.astype(jnp.int32), 0)
        sample = extract_row_ids_from_csr(offsets, indices).astype(jnp.int32)
        coeff = coeff * live.astype(acc_dt)

    lines = jnp.take(packed, flat // k, axis=0)  # [n, k*W]
    if k > 1:
        lines = lines.reshape(n, k, width)
        sub = (flat % k)[:, None] == jnp.arange(k, dtype=jnp.int32)[None, :]
        rows = jnp.sum(
            jnp.where(sub[:, :, None], lines.astype(acc_dt), 0.0), axis=1
        )
    else:
        rows = lines.astype(acc_dt)

    if mode == CombineMode.CONCAT:
        return rows.astype(packed.dtype)

    rows = rows * coeff[:, None]
    if offsets is None:
        out = jnp.sum(rows.reshape(batch, hotness, width), axis=1)
    else:
        out = jax.ops.segment_sum(
            rows, sample, num_segments=batch, indices_are_sorted=True
        )
    return out.astype(packed.dtype)
