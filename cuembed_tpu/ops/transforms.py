"""Index transforms, as jitted JAX (no kernels needed).

The reference implements these with CUB device-wide primitives
(``cuembed/include/index_transforms.cuh``); on TPU each is one or two XLA
ops that the compiler fuses and schedules:

* row-id extraction (``index_transforms.cuh:45-93``) — iota/searchsorted,
* COO transpose = sort by lookup index (``index_transforms.cuh:95-250``,
  CUB radix sort) — ``jax.lax.sort`` with multiple operands,
* compressed-gradient remapping (``index_transforms.cuh:252-323``,
  adjacent-difference + inclusive scan) — ``jnp.cumsum`` of boundary flags,
* ``compact_sparse_indices`` (``embedding_lookup_kernels.cuh:289-302``) —
  first-occurrence scatter producing the inverse mapping.

There is no two-call workspace-query protocol (``index_transforms.cuh:121-124``):
XLA owns allocation.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(0, 1, 2))
def extract_row_ids_from_fixed(batch: int, hotness: int, dtype=jnp.int32):
    """``row_ids[i] = i // hotness`` (reference ``index_transforms.cuh:46-55``)."""
    return (jnp.arange(batch * hotness, dtype=dtype) // hotness).astype(dtype)


@jax.jit
def extract_row_ids_from_csr(offsets: jax.Array, indices: jax.Array) -> jax.Array:
    """Per-nonzero sample ids from CSR offsets.

    For position p, the sample i with ``offsets[i] <= p < offsets[i+1]``
    (reference ``index_transforms.cuh:67-74``). ``indices`` is only used for
    its static length (the nnz capacity); positions past ``offsets[-1]`` get
    clamped into the last sample and must be masked by callers.

    Implementation: one boundary scatter + cumsum. (A ``searchsorted``
    formulation lowers to ~log(batch) sequential device gathers and
    measured ~100x slower at 262K nonzeros on v5e.)
    """
    nnz = indices.shape[0]
    batch = offsets.shape[0] - 1
    # +1 at each sample boundary offsets[1..batch-1]; empty samples stack.
    marks = jnp.zeros((nnz,), indices.dtype).at[
        offsets[1:batch].astype(jnp.int32)
    ].add(1, mode="drop")
    return jnp.cumsum(marks).astype(indices.dtype)


@partial(jax.jit, static_argnums=(0, 1))
def extract_row_ids_for_concat(nnz: int, dtype=jnp.int32):
    """Identity sequence (reference ``index_transforms.cuh:86-93``)."""
    return jnp.arange(nnz, dtype=dtype)


@jax.jit
def transpose(
    sample_ids: jax.Array,
    indices: jax.Array,
    weights: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Sort the COO by lookup index.

    The TPU replacement for ``cub::DeviceRadixSort``-based ``Transpose``
    (``index_transforms.cuh:95-250``): one multi-operand ``lax.sort`` keyed
    on (index, sample_id) — stable tie-breaking on sample_id matches the
    CPU reference's tuple sort (``index_transforms_cpu.hpp:104-115``).

    Returns ``(transpose_indices, transpose_sample_ids, transpose_weights)``.
    """
    if weights is None:
        t_idx, t_sid = jax.lax.sort((indices, sample_ids), num_keys=2)
        return t_idx, t_sid, None
    t_idx, t_sid, t_w = jax.lax.sort((indices, sample_ids, weights), num_keys=2)
    return t_idx, t_sid, t_w


@partial(jax.jit, static_argnames=("chunk_elems", "nonhead_slots"))
def transpose_masked_compact(
    sample_ids: jax.Array,
    masked_idx: jax.Array,
    weights: Optional[jax.Array] = None,
    *,
    chunk_elems: int = 2048,
    nonhead_slots: int = 0,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Index-sort a sentinel-masked COO, compacting non-head first.

    The tiered backward masks MXU-head positions to an int32-max
    sentinel before the transpose, so typically only ~40-65% of
    positions (the calibrated non-head fraction) actually need
    grouping — yet the global ``lax.sort`` still pays for all of them
    (~7.7 ms for 4.2M keys at the flagship, the round-4 verdict's
    slowest un-attacked stage). Here the stream is first compacted with
    one cheap per-chunk row-wise sort (~1 ms for the same volume,
    docs/PERF_NOTES.md §pitfalls): non-head positions sort to a static
    front slice of ``nonhead_slots`` per ``chunk_elems`` chunk, and only
    the compacted ~nonhead fraction rides the global sort. A chunk
    whose non-head count exceeds the calibrated slots falls back to the
    plain full transpose via ``lax.cond`` — always exact.

    Output contract: identical static shapes and identical
    (index-sorted, stable) content as ``transpose(sample_ids,
    masked_idx, weights)`` for every non-sentinel entry; sentinel
    entries sort last as usual but their sample ids / weights are
    UNSPECIFIED (zeros on the fast path). Callers already never read
    them: sentinel targets are dropped by the backward scatters.

    Use ``nonhead_slots = cfg.mid_slots + cfg.cold_slots`` (the
    calibrated per-chunk non-head capacity). ``nonhead_slots = 0`` or a
    capacity that would not compress (> 3/4 of the chunk) or a stream
    too short to amortize the chunk machinery degrades to the plain
    transpose.

    Assumes ``sample_ids`` are non-decreasing in position (true for
    every COO this library builds: fixed-hotness ``pos // hotness`` and
    CSR row-ids) — that makes the stable single-key sorts here
    tie-break identically to ``transpose``'s (index, sample) two-key
    sort.
    """
    n = masked_idx.shape[0]
    E = chunk_elems
    S = min(int(nonhead_slots), E)
    if S <= 0 or S > (3 * E) // 4 or n < 4 * E:
        return transpose(sample_ids, masked_idx, weights)

    sentinel = jnp.iinfo(jnp.int32).max
    padded = -(-n // E) * E
    G = padded // E

    def pad(x, fill):
        if padded != n:
            x = jnp.pad(x, (0, padded - n), constant_values=fill)
        return x.reshape(G, E)

    xi = pad(masked_idx.astype(jnp.int32), sentinel)
    si = pad(sample_ids.astype(jnp.int32), 0)
    wi = None if weights is None else pad(weights, 0)

    cnt = jnp.sum((xi != sentinel).astype(jnp.int32), axis=1)
    ok = jnp.all(cnt <= S)

    k = G * S  # compacted length (< n by the S <= 3E/4 gate)
    tail = n - k

    def fast(_):
        ops = [xi, si] + ([] if wi is None else [wi])
        srt = jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=True)
        front = [o[:, :S].reshape(-1) for o in srt]
        t = jax.lax.sort(front, num_keys=1, is_stable=True)
        t_i = jnp.concatenate([t[0], jnp.full((tail,), sentinel,
                                              jnp.int32)])
        t_s = jnp.concatenate([t[1], jnp.zeros((tail,), jnp.int32)])
        if wi is None:
            return t_i, t_s, jnp.zeros((0,), jnp.float32)
        t_w = jnp.concatenate(
            [t[2], jnp.zeros((tail,), weights.dtype)]
        )
        return t_i, t_s, t_w

    def slow(_):
        t_i, t_s, t_w = transpose(sample_ids, masked_idx, weights)
        if t_w is None:
            t_w = jnp.zeros((0,), jnp.float32)
        return t_i, t_s, t_w

    t_i, t_s, t_w = jax.lax.cond(ok, fast, slow, 0)
    return t_i, t_s, (None if weights is None else t_w)


@jax.jit
def compute_compressed_grad_indices(sorted_indices: jax.Array) -> jax.Array:
    """Dense 0..num_unique-1 ids over a sorted index array.

    ``remapped = inclusive_scan(adjacent_diff != 0)`` with ``remapped[0]=0``
    (reference ``index_transforms.cuh:278-323``). ``num_unique`` is
    ``remapped[-1] + 1``.
    """
    flags = jnp.concatenate(
        [
            jnp.zeros((1,), dtype=sorted_indices.dtype),
            (sorted_indices[1:] != sorted_indices[:-1]).astype(sorted_indices.dtype),
        ]
    )
    return jnp.cumsum(flags).astype(sorted_indices.dtype)


@partial(jax.jit, static_argnums=(2,))
def compact_sparse_indices(
    sorted_indices: jax.Array,
    remapped_indices: jax.Array,
    fill_value: Optional[int] = None,
) -> jax.Array:
    """Inverse mapping: original index for each remapped (dense) id.

    ``inverse_mapping[remapped[i]] = sorted_indices[i]`` (reference
    ``embedding_lookup_kernels.cuh:289-302``). All duplicates of a run write
    the same value, so scatter order is immaterial. Returned array has the
    full nnz capacity; entries at or beyond num_unique hold ``fill_value``
    (default 0).
    """
    nnz = sorted_indices.shape[0]
    init = jnp.full((nnz,), fill_value or 0, dtype=sorted_indices.dtype)
    # remapped ids are non-decreasing over sorted indices by construction
    return init.at[remapped_indices].set(
        sorted_indices, indices_are_sorted=True
    )
