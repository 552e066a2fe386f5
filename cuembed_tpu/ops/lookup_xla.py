"""XLA-composed embedding lookup (gather + segment reduce).

The baseline compute path: pure ``jnp`` ops that XLA lowers to its own
gather / scatter / sort machinery. Always correct, always jittable, used

* as the fallback for shapes the Pallas kernels don't cover,
* as the on-device reference every Pallas kernel must match bit-for-bit
  on integer-exact data,
* as the yardstick the Pallas kernels must beat in the benchmark.

Forward semantics mirror ``EmbeddingForward``
(``cuembed/include/embedding_lookup.cuh:245-308``); backward mirrors
``EmbeddingBackward`` (``:423-483``) but is built on sort + segment-sum
instead of atomics, making it deterministic (the reference's own PyTorch
test must use ``allclose`` because of its atomics —
``examples/pytorch/cuembed_test.py:33``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from cuembed_tpu.ops.transforms import (
    compact_sparse_indices,
    compute_compressed_grad_indices,
    extract_row_ids_from_csr,
    transpose,
)
from cuembed_tpu.types import CombineMode, accumulation_dtype


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("mode", "low_precision_math"))
def embedding_forward_xla(
    table: jax.Array,
    indices: jax.Array,
    offsets: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    *,
    mode: CombineMode = CombineMode.SUM,
    low_precision_math: bool = False,
) -> jax.Array:
    """Forward lookup via XLA gather + reduce.

    Args:
      table: ``[num_categories, width]``.
      indices: ``[batch, hotness]`` (fixed) or flat ``[capacity]`` (CSR).
      offsets: ``[batch + 1]`` CSR offsets; None selects fixed-hotness.
        With CSR, positions >= ``offsets[-1]`` are padding and ignored.
      weights: same shape as indices (SUM only).
      mode: SUM / MEAN / CONCAT (CONCAT is fixed-hotness only).
      low_precision_math: accumulate half tables in half precision.

    Returns:
      ``[batch, width]``, or ``[batch * hotness, width]`` for CONCAT.
    """
    if weights is not None and mode != CombineMode.SUM:
        raise ValueError("weights only supported with SUM")
    acc_dt = accumulation_dtype(table.dtype, low_precision_math)

    if offsets is None:
        if indices.ndim != 2:
            raise ValueError("fixed-hotness indices must be [batch, hotness]")
        rows = jnp.take(table, indices, axis=0)  # [B, H, D]
        if mode == CombineMode.CONCAT:
            b, h = indices.shape
            return rows.reshape(b * h, table.shape[1])
        rows = rows.astype(acc_dt)
        if weights is not None:
            rows = rows * weights.astype(acc_dt)[..., None]
        out = jnp.sum(rows, axis=1)
        if mode == CombineMode.MEAN:
            out = out / indices.shape[1]
        return out.astype(table.dtype)

    # CSR path.
    if mode == CombineMode.CONCAT:
        raise ValueError("CSR does not support CONCAT")
    if indices.ndim != 1:
        raise ValueError("CSR indices must be flat [capacity]")
    batch = offsets.shape[0] - 1
    cap = indices.shape[0]
    pos = jnp.arange(cap, dtype=offsets.dtype)
    valid = pos < offsets[-1]
    sample_of_pos = extract_row_ids_from_csr(offsets, indices).astype(
        jnp.int32
    )
    rows = jnp.take(table, indices, axis=0).astype(acc_dt)  # [cap, D]
    coeff = jnp.where(valid, jnp.ones((cap,), acc_dt), jnp.zeros((cap,), acc_dt))
    if weights is not None:
        coeff = coeff * weights.astype(acc_dt)
    rows = rows * coeff[:, None]
    out = jax.ops.segment_sum(
        rows, sample_of_pos, num_segments=batch, indices_are_sorted=True
    )
    if mode == CombineMode.MEAN:
        hot = (offsets[1:] - offsets[:-1]).astype(acc_dt)
        scale = jnp.where(hot == 0, jnp.zeros_like(hot), 1.0 / jnp.maximum(hot, 1))
        out = out * scale[:, None]
    return out.astype(table.dtype)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


class CompressedGrad(NamedTuple):
    """Compressed (deduplicated) embedding gradient.

    ``rows[i]`` is the gradient for table row ``unique_indices[i]``, for
    ``i < num_unique``; entries past ``num_unique`` are zero-padding.
    The analog of the reference's compressed-grad output + inverse mapping
    (``embedding_lookup.cuh:423-483``).
    """

    rows: jax.Array  # [capacity, width]
    unique_indices: jax.Array  # [capacity]; valid prefix of length num_unique
    num_unique: jax.Array  # scalar int32


@partial(jax.jit, static_argnames=("num_categories",))
def embedding_backward_xla(
    grad_y: jax.Array,
    num_categories: int,
    transpose_indices: jax.Array,
    transpose_sample_ids: jax.Array,
    transpose_weights: Optional[jax.Array] = None,
    *,
    nnz: Optional[jax.Array] = None,
    initial_grad: Optional[jax.Array] = None,
) -> jax.Array:
    """Full (dense-table-shaped) gradient from index-sorted COO.

    Deterministic segment-sum over sorted runs; the unique-row partials are
    scattered with non-overlapping indices, replacing the reference's
    boundary atomics (``embedding_lookup_kernels.cuh:239-286``).

    Args:
      grad_y: ``[batch or nnz, width]`` upstream gradient.
      num_categories: rows of the gradient table.
      transpose_indices/sample_ids/weights: index-sorted COO ``[capacity]``.
      nnz: live prefix length (positions >= nnz are padding); defaults to
        the full capacity.
      initial_grad: optional ``[num_categories, width]`` buffer to
        accumulate into — the functional analog of the reference's
        ``skip_grad_init=true`` calling convention
        (``embedding_lookup.cuh:455-461``: caller owns a pre-initialized
        gradient and the kernel only adds).

    Returns:
      ``[num_categories, width]`` gradient.
    """
    # One direct scatter-add with sorted target indices. Measured on v5e
    # this beats the segment_sum -> compact -> scatter chain (XLA's
    # segment_sum is itself a scatter at ~78 M rows/s; sorted scatter-add
    # runs at ~96 M rows/s and skips the extra pass). XLA scatter-add
    # applies duplicate indices in order — deterministic, like the rest
    # of this backward (no atomics anywhere).
    cap = transpose_indices.shape[0]
    pos = jnp.arange(cap, dtype=jnp.int32)
    live = pos < nnz if nnz is not None else jnp.ones((cap,), bool)
    g = jnp.take(grad_y, transpose_sample_ids, axis=0)
    coeff = live.astype(grad_y.dtype)
    if transpose_weights is not None:
        coeff = coeff * transpose_weights.astype(grad_y.dtype)
    g = g * coeff[:, None]
    # Padded entries carry an out-of-range index (callers pad with an
    # int32-max sentinel before the sort) — mode="drop" discards them; if
    # a caller passed in-range padding, coeff zero already neutralizes it.
    if initial_grad is None:
        grad = jnp.zeros((num_categories, grad_y.shape[1]), dtype=grad_y.dtype)
    else:
        grad = initial_grad.astype(grad_y.dtype)
    return grad.at[transpose_indices].add(
        g, mode="drop", indices_are_sorted=True
    )


@jax.jit
def embedding_backward_compressed_xla(
    grad_y: jax.Array,
    transpose_indices: jax.Array,
    transpose_sample_ids: jax.Array,
    transpose_weights: Optional[jax.Array] = None,
    *,
    nnz: Optional[jax.Array] = None,
) -> CompressedGrad:
    """Compressed gradient: one row per unique lookup index.

    Mirrors the reference's ``compressed_grad`` path (remapped indices +
    inverse mapping, ``embedding_lookup.cuh:439-452``).
    """
    rows, unique_idx, num_unique = _segment_partials(
        grad_y, transpose_indices, transpose_sample_ids, transpose_weights, nnz,
        sentinel_for_pad=False,
    )
    return CompressedGrad(rows=rows, unique_indices=unique_idx, num_unique=num_unique)


def _segment_partials(
    grad_y: jax.Array,
    t_idx: jax.Array,
    t_sid: jax.Array,
    t_w: Optional[jax.Array],
    nnz: Optional[jax.Array],
    sentinel_for_pad: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Shared core: per-unique-index gradient partial sums.

    Returns ``(rows [cap, D], unique_indices [cap], num_unique)`` where
    ``rows[r]`` is the summed gradient of the r-th unique index. Padded
    row slots are zero; padded unique_indices are a sentinel (table size,
    guaranteed out of range) when ``sentinel_for_pad`` else 0.
    """
    cap = t_idx.shape[0]
    pos = jnp.arange(cap, dtype=jnp.int32)
    live = pos < nnz if nnz is not None else jnp.ones((cap,), bool)

    # Dense run ids over the sorted (live) prefix. Force the padded tail into
    # its own trailing segment so it never pollutes a live run. Callers must
    # sort padded entries to the end (pad with a large sentinel pre-sort).
    sentinel = jnp.iinfo(jnp.int32).max
    idx_for_runs = jnp.where(live, t_idx, sentinel)
    remapped = compute_compressed_grad_indices(idx_for_runs)

    g = jnp.take(grad_y, t_sid, axis=0)  # [cap, D]
    coeff = jnp.where(live, 1.0, 0.0).astype(grad_y.dtype)
    if t_w is not None:
        coeff = coeff * t_w.astype(grad_y.dtype)
    g = g * coeff[:, None]
    # remapped is non-decreasing by construction (cumsum of boundary
    # flags over sorted indices) — let the scatter lowering exploit it.
    rows = jax.ops.segment_sum(
        g, remapped.astype(jnp.int32), num_segments=cap,
        indices_are_sorted=True,
    )

    num_unique = jnp.where(
        jnp.any(live),
        remapped[jnp.maximum(jnp.sum(live.astype(jnp.int32)) - 1, 0)] + 1,
        0,
    ).astype(jnp.int32)
    pad_value = sentinel if sentinel_for_pad else 0
    inv = compact_sparse_indices(idx_for_runs, remapped, int(pad_value))
    rid = jnp.arange(cap, dtype=jnp.int32)
    inv = jnp.where(rid < num_unique, inv, pad_value)
    return rows, inv, num_unique
