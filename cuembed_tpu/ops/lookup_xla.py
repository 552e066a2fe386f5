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
import numpy as np

from cuembed_tpu.ops.transforms import extract_row_ids_from_csr
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
            # Multiply by the rounded reciprocal — the same operation as
            # the golden model (ref/forward.py: acc * (1/hot)), so
            # integer-exact sums stay bitwise-identical through MEAN.
            out = out * np.dtype(acc_dt).type(1.0 / indices.shape[1])
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

_LANES = 128


def _pad_gy_to_lanes(grad_y):
    """Pad sub-lane-width grad rows to the 128-lane tile.

    Scatters of [k, W<128] rows measured ~8 M rows/s on v5e (masked
    partial-lane read-modify-writes) vs ~90 M rows/s at full lanes —
    padding the pipeline and slicing the result is ~10x faster despite
    4x the bytes.
    """
    w = grad_y.shape[1]
    if w >= _LANES:
        return grad_y, w
    return jnp.pad(grad_y, ((0, 0), (0, _LANES - w))), w


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


@partial(jax.jit, static_argnames=("num_categories", "live_cap"))
def embedding_backward_xla(
    grad_y: jax.Array,
    num_categories: int,
    transpose_indices: jax.Array,
    transpose_sample_ids: jax.Array,
    transpose_weights: Optional[jax.Array] = None,
    *,
    nnz: Optional[jax.Array] = None,
    initial_grad: Optional[jax.Array] = None,
    live_cap: Optional[int] = None,
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
      live_cap: static calibrated bound on the live entries. A sorted
        COO keeps its padding (int32-max sentinels) at the tail, so the
        gather+scatter run over ``[:live_cap]`` — CSR buffers are
        typically ~2x padded and every per-position cost here is
        descriptor-bound. A batch with more live entries falls back to
        the full capacity via ``lax.cond`` (requires ``nnz``).

    Returns:
      ``[num_categories, width]`` gradient.
    """
    gy_p, w_orig = _pad_gy_to_lanes(grad_y)
    if gy_p is not grad_y:
        init_p = (
            None if initial_grad is None
            else jnp.pad(
                initial_grad, ((0, 0), (0, _LANES - w_orig))
            )
        )
        out = embedding_backward_xla(
            gy_p, num_categories, transpose_indices, transpose_sample_ids,
            transpose_weights, nnz=nnz, initial_grad=init_p,
            live_cap=live_cap,
        )
        return out[:, :w_orig]

    cap_full = transpose_indices.shape[0]
    if live_cap is not None and 0 < live_cap < cap_full:
        k = -(-live_cap // 8) * 8
        live_n = (
            nnz if nnz is not None
            else jnp.sum(
                (transpose_indices != jnp.iinfo(jnp.int32).max)
                .astype(jnp.int32)
            )
        )

        def sliced(c):
            return embedding_backward_xla(
                grad_y, num_categories, transpose_indices[:c],
                transpose_sample_ids[:c],
                None if transpose_weights is None
                else transpose_weights[:c],
                nnz=nnz, initial_grad=initial_grad,
            )

        return jax.lax.cond(
            live_n <= k, lambda _: sliced(k), lambda _: sliced(cap_full), 0
        )

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


@partial(jax.jit, static_argnames=("live_cap",))
def embedding_backward_compressed_xla(
    grad_y: jax.Array,
    transpose_indices: jax.Array,
    transpose_sample_ids: jax.Array,
    transpose_weights: Optional[jax.Array] = None,
    *,
    nnz: Optional[jax.Array] = None,
    live_cap: Optional[int] = None,
) -> CompressedGrad:
    """Compressed gradient: one row per unique lookup index.

    Mirrors the reference's ``compressed_grad`` path (remapped indices +
    inverse mapping, ``embedding_lookup.cuh:439-452``).

    ``live_cap``: static calibrated bound on the live entries — a sorted
    COO keeps its sentinel padding at the tail, so the descriptor-bound
    gather/scatters run over ``[:live_cap]`` (CSR buffers are typically
    ~2x padded). Output buffers keep the full capacity; a batch with
    more live entries computes at full width via ``lax.cond``.
    """
    gy_p, w_orig = _pad_gy_to_lanes(grad_y)
    if gy_p is not grad_y:
        out = embedding_backward_compressed_xla(
            gy_p, transpose_indices, transpose_sample_ids,
            transpose_weights, nnz=nnz, live_cap=live_cap,
        )
        return CompressedGrad(
            rows=out.rows[:, :w_orig],
            unique_indices=out.unique_indices,
            num_unique=out.num_unique,
        )
    cap = transpose_indices.shape[0]

    def go(c):
        rows, unique_idx, num_unique = _segment_partials(
            grad_y, transpose_indices[:c], transpose_sample_ids[:c],
            None if transpose_weights is None else transpose_weights[:c],
            nnz, sentinel_for_pad=False, out_cap=cap,
        )
        return rows, unique_idx, num_unique

    if live_cap is not None and 0 < live_cap < cap:
        k = -(-live_cap // 8) * 8
        live_n = (
            nnz if nnz is not None
            else jnp.sum(
                (transpose_indices != jnp.iinfo(jnp.int32).max)
                .astype(jnp.int32)
            )
        )
        rows, unique_idx, num_unique = jax.lax.cond(
            live_n <= k, lambda _: go(k), lambda _: go(cap), 0
        )
    else:
        rows, unique_idx, num_unique = go(cap)
    return CompressedGrad(rows=rows, unique_indices=unique_idx, num_unique=num_unique)


def embedding_backward_compressed_tiered(
    grad_y: jax.Array,
    num_categories: int,
    indices2d: jax.Array,
    coeff2d: jax.Array,
    t_idx: jax.Array,
    t_sid: jax.Array,
    t_coeff: Optional[jax.Array],
    cfg,
    *,
    unique_cap: Optional[int] = None,
) -> CompressedGrad:
    """Compressed gradient with the MXU head absorbing the hottest rows.

    Same output contract as :func:`embedding_backward_compressed_xla`
    (unique rows ascending + num_unique), same inputs as the tiered
    full backward (:func:`cuembed_tpu.ops.head.tiered_backward_coo`):
    the COO must be index-sorted with head positions (``idx <
    cfg.mxu_head_rows``) replaced by an int32-max sentinel before the
    sort. The head's per-row gradients come from one ``M^T @ grad_y``
    matmul and land directly at ranks ``0..n_head_appeared`` (head rows
    are the hottest, hence the lowest unique indices); the segment
    scatter covers only the calibrated non-head prefix with its ranks
    shifted past the head block — no multi-GB placement copies.

    ``unique_cap``: optional static bound on the number of unique
    non-head rows (calibrate like the slot capacities). It shrinks the
    output buffers from nnz-sized to ``unique_cap + head_rows`` —
    multi-GB of scatter-target zeros on big batches. It is a caller
    contract: a batch with more unique rows drops the excess runs, and
    ``num_unique > rows.shape[0]`` flags the violation for the caller.
    Default (None) is always exact with capacity ``nnz + head_rows``.
    """
    from cuembed_tpu.ops.head import nonhead_capacity

    gy_p, w_orig = _pad_gy_to_lanes(grad_y)
    if gy_p is not grad_y:
        out = embedding_backward_compressed_tiered(
            gy_p, num_categories, indices2d, coeff2d, t_idx, t_sid,
            t_coeff, cfg, unique_cap=unique_cap,
        )
        return CompressedGrad(
            rows=out.rows[:, :w_orig],
            unique_indices=out.unique_indices,
            num_unique=out.num_unique,
        )

    acc_dt = grad_y.dtype
    head_rows = min(cfg.mxu_head_rows, num_categories)
    nnz_cap = t_idx.shape[0]
    cap = (
        nnz_cap + head_rows if unique_cap is None
        else min(unique_cap + head_rows, nnz_cap + head_rows)
    )
    width = grad_y.shape[1]
    sentinel = jnp.iinfo(jnp.int32).max

    # --- head block: dense [head, W] grads + which head rows appeared ---
    # coeff2d=None (unit coefficients) shares ONE compare-reduce between
    # the head matrix and the appeared mask (M is then pure counts).
    from cuembed_tpu.ops.head import head_matrix

    m, appeared = head_matrix(
        indices2d, coeff2d, head_rows, acc_dt, return_appeared=True
    )
    g_head = jax.lax.dot_general(
        m, grad_y,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_dt,
        precision=jax.lax.Precision.HIGHEST,
    )  # [head, W] == M^T @ grad_y
    cols = jnp.arange(head_rows, dtype=jnp.int32)
    n_head_u = jnp.sum(appeared.astype(jnp.int32))
    rank = jnp.cumsum(appeared.astype(jnp.int32)) - 1
    # Non-appeared rows get DISTINCT out-of-range targets (cap + col) so
    # the unique_indices promise genuinely holds (a shared 'cap' value
    # repeated per dropped row would be duplicate indices — undefined
    # under the promise; cuembed_tpu/train.py uses the same convention).
    scatter_to = jnp.where(appeared, rank, cap + cols)
    init_rows = (
        jnp.zeros((cap, width), acc_dt)
        .at[scatter_to]
        .set(g_head, mode="drop", unique_indices=True)
    )
    init_uniq = (
        jnp.full((cap,), sentinel, jnp.int32)
        .at[scatter_to]
        .set(cols, mode="drop", unique_indices=True)
    )

    # --- non-head: rank-shifted segment reduce over the prefix ----------
    rest_count = jnp.sum((t_idx != sentinel).astype(jnp.int32))
    k_cap = min(nonhead_capacity(cfg, nnz_cap), nnz_cap)

    pos = jnp.arange(nnz_cap, dtype=jnp.int32)
    live = pos < rest_count
    boundary = jnp.concatenate(
        [live[:1], (t_idx[1:] != t_idx[:-1]) & live[1:]]
    )
    ranks = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    n_nh = jnp.maximum(ranks[-1] + 1, 0).astype(jnp.int32)

    tgt = jnp.where(live, ranks + n_head_u, cap)

    def gathered(lo, hi):
        # promise_in_bounds: sample ids are in range by construction —
        # the default 'fill' mode adds a full [k, W] select pass when it
        # cannot fuse past the optimization barrier.
        g = grad_y.at[t_sid[lo:hi]].get(mode="promise_in_bounds")
        if t_coeff is not None:
            g = g * t_coeff[lo:hi].astype(acc_dt)[:, None]
        return jax.lax.optimization_barrier(g)

    def uniq_scatter(k):
        return init_uniq.at[
            jnp.where(boundary[:k], tgt[:k], cap)
        ].set(jnp.where(live[:k], t_idx[:k], sentinel), mode="drop")

    # Run-heavy prefix via per-chunk one-hot matmuls (the mid tier's
    # long runs sort first): measured ~3x the sorted row-scatter rate.
    chunk = cfg.bwd_seg_chunk
    u_cap = cfg.bwd_seg_slots
    S = 0
    if u_cap > 0 and cfg.bwd_run_frac > 0:
        # chunk-align AFTER the k_cap clamp: k_cap is only 8-aligned,
        # and ranks[:S].reshape(S//chunk, chunk) needs S % chunk == 0.
        S = min(int(nnz_cap * cfg.bwd_run_frac), k_cap) // chunk * chunk
    mxu_ok = jnp.bool_(True)
    if S > 0:
        g2 = S // chunk
        r2 = ranks[:S].reshape(g2, chunk)
        base = r2[:, :1]
        local = r2 - base
        mxu_ok = jnp.max(local[:, -1]) + 1 <= u_cap

    def seg_fast(_):
        # One gather over the whole prefix (a single gy-reading fusion
        # keeps XLA placing grad_y in VMEM — two fusions demoted it to
        # HBM rate in profiling); the dot input is a free bitcast of the
        # leading rows.
        g = gathered(0, k_cap)
        rows = init_rows
        if S > 0:
            g_m = g[:S]
            local_m = jnp.where(
                live[:S].reshape(g2, chunk), local, u_cap
            )
            onehot = (
                local_m[..., None] == jnp.arange(u_cap, dtype=jnp.int32)
            ).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                onehot, g_m.reshape(g2, chunk, width),
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=acc_dt,
                precision=jax.lax.Precision.HIGHEST,
            )  # [g2, u_cap, W]
            # Slab targets base+u: slots past a chunk's local-unique
            # count hold zero partials (one-hot misses) — adding them
            # anywhere in range is a no-op, so no masking is needed.
            mtgt = (
                base + jnp.arange(u_cap, dtype=jnp.int32)[None, :] + n_head_u
            )
            rows = rows.at[mtgt.reshape(-1)].add(
                part.reshape(g2 * u_cap, width), mode="drop"
            )
        rows = rows.at[tgt[S:k_cap]].add(
            g[S:], mode="drop", indices_are_sorted=True
        )
        return rows, uniq_scatter(k_cap)

    def seg_full(_):
        rows = init_rows.at[tgt].add(
            gathered(0, nnz_cap), mode="drop", indices_are_sorted=True
        )
        return rows, uniq_scatter(nnz_cap)

    if S == 0 and k_cap >= nnz_cap:
        rows, uniq = seg_full(0)
    else:
        pred = mxu_ok
        if k_cap < nnz_cap:
            pred = pred & (rest_count <= k_cap)
        rows, uniq = jax.lax.cond(pred, seg_fast, seg_full, 0)

    num_unique = (n_head_u + n_nh).astype(jnp.int32)
    return CompressedGrad(rows=rows, unique_indices=uniq,
                          num_unique=num_unique)


def _compressed_scatter(
    grad_y: jax.Array,
    t_idx: jax.Array,
    t_sid: jax.Array,
    t_w: Optional[jax.Array],
    live_count: Optional[jax.Array],
    *,
    out_cap: int,
    rank_offset=0,
    uniq_pad: int = 0,
    init_rows: Optional[jax.Array] = None,
    init_uniq: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Rank-offset compressed scatter over an index-sorted COO prefix.

    Returns ``(rows [out_cap, W], uniq [out_cap], n_runs)``: run ``r``
    (dense rank over the live prefix, shifted by ``rank_offset``) holds
    the summed gradient of its index in ``rows`` and the index value in
    ``uniq``. Slots not written keep their init (zeros / ``uniq_pad``).

    Perf notes (profiled on v5e): the gather is materialized behind an
    ``optimization_barrier`` — XLA otherwise fuses gather+scatter into
    one loop running ~57 M rows/s, while split they run at ~358 (VMEM
    gy gather) and ~96 (sorted row scatter) M rows/s. ``out_cap`` can be
    far below nnz when the caller bounds the unique count (the target
    zeros then shrink from GBs to MBs); runs past ``out_cap -
    rank_offset`` are dropped, so callers must guard with ``n_runs``.
    """
    k = t_idx.shape[0]
    width = grad_y.shape[1]
    pos = jnp.arange(k, dtype=jnp.int32)
    live = (pos < live_count) if live_count is not None else jnp.ones((k,), bool)
    sentinel = jnp.iinfo(jnp.int32).max
    idxs = jnp.where(live, t_idx, sentinel)
    boundary = jnp.concatenate(
        [live[:1], (idxs[1:] != idxs[:-1]) & live[1:]]
    )
    ranks = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    n_runs = jnp.maximum(ranks[-1] + 1, 0).astype(jnp.int32)

    g = grad_y.at[t_sid].get(mode="promise_in_bounds")
    if t_w is not None:
        # Dead positions are dropped by target, so only the raw weight
        # multiplies — no liveness factor, no extra masking pass.
        g = g * t_w.astype(grad_y.dtype)[:, None]
    g = jax.lax.optimization_barrier(g)

    # Dead positions route to the out-of-range target and are dropped —
    # cheaper than multiplying a liveness coefficient over [k, W]
    # (a full extra stream pass, ~8 ms at flagship scale).
    tgt = ranks + rank_offset
    if live_count is not None:
        tgt = jnp.where(live, tgt, out_cap)
    rows = (
        jnp.zeros((out_cap, width), grad_y.dtype)
        if init_rows is None
        else init_rows
    )
    rows = rows.at[tgt].add(g, mode="drop", indices_are_sorted=True)
    uniq = (
        jnp.full((out_cap,), uniq_pad, jnp.int32)
        if init_uniq is None
        else init_uniq
    )
    uniq_tgt = jnp.where(boundary, tgt, out_cap)
    uniq = uniq.at[uniq_tgt].set(
        jnp.where(live, t_idx, uniq_pad).astype(jnp.int32), mode="drop"
    )
    return rows, uniq, n_runs


def _segment_partials(
    grad_y: jax.Array,
    t_idx: jax.Array,
    t_sid: jax.Array,
    t_w: Optional[jax.Array],
    nnz: Optional[jax.Array],
    sentinel_for_pad: bool = True,
    out_cap: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Shared core: per-unique-index gradient partial sums.

    Returns ``(rows [out_cap, D], unique_indices [out_cap], num_unique)``
    where ``rows[r]`` is the summed gradient of the r-th unique index
    (``out_cap`` defaults to the COO length). Padded row slots are zero;
    padded unique_indices are a sentinel (int32 max, guaranteed out of
    range) when ``sentinel_for_pad`` else 0.
    """
    cap = out_cap if out_cap is not None else t_idx.shape[0]
    sentinel = jnp.iinfo(jnp.int32).max
    pad_value = sentinel if sentinel_for_pad else 0
    return _compressed_scatter(
        grad_y, t_idx, t_sid, t_w, nnz, out_cap=cap, uniq_pad=int(pad_value)
    )
