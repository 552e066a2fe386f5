"""Sparse embedding-table training updates.

``jax.grad`` through :func:`embedding_lookup` is exact but materializes a
dense ``[num_categories, width]`` gradient — at the reference flagship
scale that is a 10 GB fp32 buffer written (zeros) and read back every
step, and it dominates the train step (measured: the dense fwd+bwd is
~2x the sparse path on v5e). Production recommender stacks apply
embedding gradients sparsely instead; this module provides that path:

* :func:`embedding_grad_y` — split the model's backward at the pooled
  embedding: dense parameters keep ordinary autodiff, the table receives
  its update through the sparse routines below.
* :func:`sgd_sparse_update` — ``table[r] -= lr * sum_p coeff_p * grad_y[s_p]``
  applied with one sorted scatter-add (plus the MXU-head matmul when a
  tiered config is given), never materializing the dense gradient.
* :func:`rowwise_adagrad_sparse_update` — the standard DLRM embedding
  optimizer (one accumulator scalar per row): compressed per-row
  gradient sums via sort + segment reduction, then row-sparse updates of
  the accumulator and the table.

All functions are jittable with static shapes and deterministic (sorted
segment reductions, no atomics — stronger than the reference, whose
framework test needs ``allclose`` because of atomics,
``cuembed_test.py:33``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cuembed_tpu.ops.head import head_grad, nonhead_capacity
from cuembed_tpu.ops.lookup_xla import _segment_partials
from cuembed_tpu.ops.tiered import TieredConfig
from cuembed_tpu.ops.transforms import (
    extract_row_ids_from_csr,
    transpose,
    transpose_masked_compact,
)
from cuembed_tpu.types import CombineMode, accumulation_dtype


def embedding_grad_y(loss_fn, pooled, *args, **kwargs):
    """Gradient of ``loss_fn(pooled, *args)`` w.r.t. the pooled embeddings.

    The glue for sparse training: compute ``pooled = embedding_lookup(
    stop_gradient(table), ...)`` (or just never differentiate w.r.t. the
    table), then feed ``grad_y`` to a sparse update.
    """
    return jax.grad(loss_fn)(pooled, *args, **kwargs)


def _flatten_coo(indices, offsets, weights, mode, acc_dt):
    """Shared COO flattening: (flat_idx, sample_ids, coeff).

    ``coeff`` is None when every live position has the same coefficient
    *scale* — callers fold :func:`_uniform_scale` into grad_y instead
    (saves a [nnz, W] multiply pass in the sparse updates).
    """
    if offsets is None:
        batch, hotness = indices.shape
        n = batch * hotness
        flat_idx = indices.reshape(-1).astype(jnp.int32)
        pos = jnp.arange(n, dtype=jnp.int32)
        if mode == CombineMode.CONCAT:
            # CONCAT's grad_y has one row per (sample, position).
            if weights is not None:
                raise ValueError("weights unsupported with CONCAT")
            sample_ids = pos
        else:
            sample_ids = pos // hotness
        if weights is None:
            return flat_idx, sample_ids, None
        coeff = weights.reshape(-1).astype(acc_dt)
        if mode == CombineMode.MEAN:
            coeff = coeff / hotness
    else:
        batch = offsets.shape[0] - 1
        n = indices.shape[0]
        pos = jnp.arange(n, dtype=jnp.int32)
        live = pos < offsets[-1]
        flat_idx = jnp.where(live, indices.astype(jnp.int32), 0)
        sample_ids = extract_row_ids_from_csr(offsets, indices).astype(
            jnp.int32
        )
        coeff = live.astype(acc_dt)
        if weights is not None:
            coeff = coeff * weights.astype(acc_dt)
        if mode == CombineMode.MEAN:
            hot = (offsets[1:] - offsets[:-1]).astype(acc_dt)
            inv = jnp.where(hot == 0, 0.0, 1.0 / jnp.maximum(hot, 1.0))
            coeff = coeff * jnp.take(inv, sample_ids)
    return flat_idx, sample_ids, coeff


def sgd_sparse_update(
    table: jax.Array,
    indices: jax.Array,
    grad_y: jax.Array,
    *,
    lr: float,
    offsets: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    mode: CombineMode = CombineMode.SUM,
    tiered_cfg: Optional[TieredConfig] = None,
    overflow: str = "fallback",
) -> jax.Array:
    """One SGD step on the table, applied sparsely.

    Exactly ``table - lr * dense_grad`` (up to fp reassociation) without
    ever allocating the dense gradient. With ``tiered_cfg``, the MXU head
    absorbs the scatter-hottest rows as a matmul.

    ``overflow`` (capacity-bounded paths only): ``"fallback"`` (default)
    re-runs an overflowing batch at full width via ``lax.cond`` — always
    exact, and measured NO slower than the unconditional path (XLA
    forwards donated buffers through conditionals). ``"drop"`` scatters
    the calibrated prefix unconditionally and silently drops an
    overflowing batch's coldest-row updates — the production
    TPU-embedding convention for capacity overflow, offered for
    semantic parity with such systems, not for speed.
    """
    acc_dt = accumulation_dtype(table.dtype, False)
    gy = grad_y.astype(acc_dt)
    if weights is None and offsets is None and mode == CombineMode.MEAN:
        gy = gy * (1.0 / indices.shape[1])  # uniform coeff folds into gy
    flat_idx, sample_ids, coeff = _flatten_coo(
        indices, offsets, weights, mode, acc_dt
    )

    head = (
        tiered_cfg.mxu_head_rows
        if (
            tiered_cfg is not None
            and offsets is None
            and mode != CombineMode.CONCAT
        )
        else 0
    )
    head = min(head, table.shape[0])
    if head > 0:
        grad_head = head_grad(
            indices,
            None if coeff is None else coeff.reshape(indices.shape),
            gy, head, acc_dt,
        )
        table = table.at[:head].add((-lr * grad_head).astype(table.dtype))
        sentinel = jnp.iinfo(jnp.int32).max
        flat_idx = jnp.where(flat_idx < head, sentinel, flat_idx)

    if head > 0 and tiered_cfg is not None:
        # Only the calibrated non-head fraction rides the global sort
        # (per-chunk compaction; lax.cond full-sort fallback on overflow).
        t_idx, t_sid, t_coeff = transpose_masked_compact(
            sample_ids, flat_idx, coeff,
            chunk_elems=tiered_cfg.chunk_elems,
            nonhead_slots=tiered_cfg.mid_slots + tiered_cfg.cold_slots,
        )
    else:
        t_idx, t_sid, t_coeff = transpose(sample_ids, flat_idx, coeff)

    def scatter(k):
        g = gy.at[t_sid[:k]].get(mode="promise_in_bounds")
        if t_coeff is not None:
            g = g * t_coeff[:k, None]
        return table.at[t_idx[:k]].add(
            (-lr * g).astype(table.dtype), mode="drop",
            indices_are_sorted=True,
        )

    n = t_idx.shape[0]
    if head > 0 and tiered_cfg is not None:
        # Head positions sorted to the back (sentinel); bound the scatter
        # at the calibrated non-head capacity, falling back on overflow.
        k_cap = nonhead_capacity(tiered_cfg, n)
        if k_cap < n:
            if overflow == "drop":
                return scatter(k_cap)
            sentinel = jnp.iinfo(jnp.int32).max
            rest_count = jnp.sum((t_idx != sentinel).astype(jnp.int32))
            return jax.lax.cond(
                rest_count <= k_cap,
                lambda _: scatter(k_cap),
                lambda _: scatter(n),
                0,
            )
    return scatter(n)


def rowwise_adagrad_init(num_categories: int) -> jax.Array:
    """Per-row accumulator state (fp32), one scalar per table row."""
    return jnp.zeros((num_categories,), jnp.float32)


def rowwise_adagrad_sparse_update(
    table: jax.Array,
    accum: jax.Array,
    indices: jax.Array,
    grad_y: jax.Array,
    *,
    lr: float,
    eps: float = 1e-8,
    offsets: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    mode: CombineMode = CombineMode.SUM,
    tiered_cfg: Optional[TieredConfig] = None,
    unique_cap: Optional[int] = None,
    overflow: str = "fallback",
) -> Tuple[jax.Array, jax.Array]:
    """Row-wise AdaGrad (the standard DLRM embedding optimizer).

    Per touched row r with gradient row G_r:
      ``accum[r] += mean(G_r^2)``;
      ``table[r] -= lr * G_r / sqrt(accum[r] + eps)``.
    Untouched rows are untouched — state and table updates are row-sparse
    (scatter over the unique rows of this batch only). With a
    ``unique_cap``: optional static bound on the number of unique
    non-head rows per batch — the compressed rows occupy a dense-ranked
    prefix, so the state/table scatters shrink to ``unique_cap`` slots
    (vs the full position capacity), with a ``lax.cond`` fallback when a
    batch exceeds it. Calibrate from representative batches. With a
    ``tiered_cfg`` (fixed-hotness), the MXU head computes G_r for the
    scatter-hottest rows exactly as one matmul and their state update is
    a dense slice op, and the remaining segment reduction is bounded at
    the calibrated non-head capacity.
    """
    acc_dt = jnp.float32
    gy = grad_y.astype(acc_dt)
    if weights is None and offsets is None and mode == CombineMode.MEAN:
        gy = gy * (1.0 / indices.shape[1])  # uniform coeff folds into gy
    flat_idx, sample_ids, coeff = _flatten_coo(
        indices, offsets, weights, mode, acc_dt
    )
    sentinel = jnp.iinfo(jnp.int32).max
    live_idx = (
        flat_idx if coeff is None
        else jnp.where(coeff != 0, flat_idx, sentinel)
    )

    head = (
        tiered_cfg.mxu_head_rows
        if (
            tiered_cfg is not None
            and offsets is None
            and mode != CombineMode.CONCAT
        )
        else 0
    )
    head = min(head, table.shape[0])

    if head > 0:
        # Unified tiered path: one compressed gradient (MXU head block +
        # segment-reduced non-head, all buffers bounded by unique_cap)
        # followed by row-sparse state/table updates over the unique
        # rows. Shares every backward optimization with the benchmark
        # path (see lookup_xla.embedding_backward_compressed_tiered).
        from cuembed_tpu.ops.lookup_xla import (
            embedding_backward_compressed_tiered,
        )

        masked = jnp.where(live_idx < head, sentinel, live_idx)
        t_idx, t_sid, t_coeff = transpose_masked_compact(
            sample_ids, masked, coeff,
            chunk_elems=tiered_cfg.chunk_elems,
            nonhead_slots=tiered_cfg.mid_slots + tiered_cfg.cold_slots,
        )
        coeff2d = None if coeff is None else coeff.reshape(indices.shape)
        cg = embedding_backward_compressed_tiered(
            gy, table.shape[0], indices, coeff2d,
            t_idx, t_sid, t_coeff, tiered_cfg, unique_cap=unique_cap,
        )
        cap = cg.rows.shape[0]
        rid = jnp.arange(cap, dtype=jnp.int32)

        def apply_compressed(rows, uniq, nu):
            valid = rid < nu
            safe = jnp.where(valid, uniq, 0)
            g2 = jnp.mean(rows * rows, axis=1) * valid
            new_acc_rows = jnp.take(accum, safe) + g2
            droppable = (~valid) | (uniq >= accum.shape[0])
            scat = jnp.where(droppable, accum.shape[0] + rid, uniq)
            new_accum = accum.at[scat].set(
                new_acc_rows, mode="drop", indices_are_sorted=True,
                unique_indices=True,
            )
            scale = jnp.where(
                valid, -lr / jnp.sqrt(new_acc_rows + eps), 0.0
            )
            new_table = table.at[scat].add(
                (rows * scale[:, None]).astype(table.dtype),
                mode="drop", indices_are_sorted=True, unique_indices=True,
            )
            return new_table, new_accum

        if cap >= t_idx.shape[0] + head or overflow == "drop":
            # No unique bound (complete output), or production drop
            # semantics: apply directly so the donated table/state update
            # in place — an XLA cond cannot alias them (see
            # sgd_sparse_update's overflow doc).
            return apply_compressed(cg.rows, cg.unique_indices,
                                    cg.num_unique)

        def ok(_):
            return apply_compressed(cg.rows, cg.unique_indices,
                                    cg.num_unique)

        def recompute_full(_):
            # unique_cap violated: recompute at full capacity (exact).
            cg_full = embedding_backward_compressed_tiered(
                gy, table.shape[0], indices, coeff2d,
                t_idx, t_sid, t_coeff, tiered_cfg,
            )
            full_cap = cg_full.rows.shape[0]
            frid = jnp.arange(full_cap, dtype=jnp.int32)
            valid = frid < cg_full.num_unique
            uniq = cg_full.unique_indices
            safe = jnp.where(valid, uniq, 0)
            g2 = jnp.mean(cg_full.rows * cg_full.rows, axis=1) * valid
            new_acc_rows = jnp.take(accum, safe) + g2
            droppable = (~valid) | (uniq >= accum.shape[0])
            scat = jnp.where(droppable, accum.shape[0] + frid, uniq)
            new_accum = accum.at[scat].set(
                new_acc_rows, mode="drop", indices_are_sorted=True,
                unique_indices=True,
            )
            scale = jnp.where(
                valid, -lr / jnp.sqrt(new_acc_rows + eps), 0.0
            )
            new_table = table.at[scat].add(
                (cg_full.rows * scale[:, None]).astype(table.dtype),
                mode="drop", indices_are_sorted=True, unique_indices=True,
            )
            return new_table, new_accum

        return jax.lax.cond(cg.num_unique <= cap, ok, recompute_full, 0)

    # Non-tiered path (CSR, CONCAT, or no config): plain segment
    # partials + row-sparse updates.
    t_idx, t_sid, t_coeff = transpose(sample_ids, live_idx, coeff)

    def apply_rest(k, u_cap=None):
        rows, unique_idx, num_unique = _segment_partials(
            gy, t_idx[:k], t_sid[:k],
            None if t_coeff is None else t_coeff[:k], None
        )
        if u_cap is not None and u_cap < k:
            # Unique rows occupy the dense-ranked prefix: shrink the
            # state/table scatters to the calibrated unique capacity.
            rows = rows[:u_cap]
            unique_idx = unique_idx[:u_cap]
            k = u_cap
        rid = jnp.arange(k, dtype=jnp.int32)
        valid = rid < num_unique
        safe_idx = jnp.where(valid, unique_idx, 0)

        g2 = jnp.mean(rows * rows, axis=1) * valid  # [k]
        new_accum_rows = jnp.take(accum, safe_idx) + g2
        # Dropped slots get DISTINCT out-of-range targets (num_rows + rid)
        # so the index vector is strictly unique AND ascending — both
        # scatter promises hold and mode="drop" discards them. The
        # int32-max padding run (always the last valid run when padding
        # exists) is remapped the same way, keeping the order ascending.
        droppable = (~valid) | (unique_idx >= accum.shape[0])
        scatter_idx = jnp.where(droppable, accum.shape[0] + rid, unique_idx)
        new_accum = accum.at[scatter_idx].set(
            new_accum_rows, mode="drop", indices_are_sorted=True,
            unique_indices=True,
        )
        scale = jnp.where(valid, -lr / jnp.sqrt(new_accum_rows + eps), 0.0)
        update = rows * scale[:, None]
        new_table = table.at[scatter_idx].add(
            update.astype(table.dtype), mode="drop", indices_are_sorted=True,
            unique_indices=True,
        )
        return new_table, new_accum

    n = t_idx.shape[0]
    k_cap = n
    if unique_cap is not None or k_cap < n:
        rest_count = jnp.sum((t_idx != sentinel).astype(jnp.int32))
        # Unique count <= rest count, so one counter guards both caps.
        pred = rest_count <= (
            k_cap if unique_cap is None else min(k_cap, n)
        )
        if unique_cap is not None:
            # Exact unique-count guard for the scatter prefix.
            live_sorted = t_idx != sentinel
            starts = jnp.concatenate(
                [
                    live_sorted[:1],
                    (t_idx[1:] != t_idx[:-1]) & live_sorted[1:],
                ]
            )
            n_unique = jnp.sum(starts.astype(jnp.int32))
            pred = (rest_count <= k_cap) & (n_unique <= unique_cap)
        return jax.lax.cond(
            pred,
            lambda _: apply_rest(k_cap, unique_cap),
            lambda _: apply_rest(n),
            0,
        )
    return apply_rest(n)


def adam_init(
    num_categories: int, width: int
) -> Tuple[jax.Array, jax.Array]:
    """Per-element Adam moments ``(m, v)``, fp32, zero-initialized."""
    z = jnp.zeros((num_categories, width), jnp.float32)
    return z, z


def adam_sparse_update(
    table: jax.Array,
    m: jax.Array,
    v: jax.Array,
    step: jax.Array,
    indices: jax.Array,
    grad_y: jax.Array,
    *,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    offsets: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    mode: CombineMode = CombineMode.SUM,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sparse LAZY Adam: moments decay and update only on touched rows.

    Per touched row r with batch gradient row ``G_r``::

        m[r] = b1*m[r] + (1-b1)*G_r
        v[r] = b2*v[r] + (1-b2)*G_r^2
        table[r] -= lr * (m[r]/(1-b1^t)) / (sqrt(v[r]/(1-b2^t)) + eps)

    Untouched rows keep their moments unchanged (the "lazy" convention —
    dense Adam would decay every row every step, an O(V*W) pass this
    path exists to avoid). ``step`` is the 1-based global step (scalar,
    may be traced) for bias correction. Moments are per-element fp32
    (``adam_init``) — 8 extra bytes per table element; prefer row-wise
    AdaGrad (:func:`rowwise_adagrad_sparse_update`) when state memory
    matters, which is the production DLRM convention.
    """
    acc_dt = jnp.float32
    gy = grad_y.astype(acc_dt)
    if weights is None and offsets is None and mode == CombineMode.MEAN:
        gy = gy * (1.0 / indices.shape[1])
    flat_idx, sample_ids, coeff = _flatten_coo(
        indices, offsets, weights, mode, acc_dt
    )
    sentinel = jnp.iinfo(jnp.int32).max
    live_idx = (
        flat_idx if coeff is None
        else jnp.where(coeff != 0, flat_idx, sentinel)
    )
    t_idx, t_sid, t_coeff = transpose(sample_ids, live_idx, coeff)
    rows, uniq, nu = _segment_partials(gy, t_idx, t_sid, t_coeff, None)
    k = rows.shape[0]
    rid = jnp.arange(k, dtype=jnp.int32)
    valid = rid < nu
    safe = jnp.where(valid, uniq, 0)
    g = rows * valid[:, None]
    m_rows = b1 * jnp.take(m, safe, axis=0) + (1.0 - b1) * g
    v_rows = b2 * jnp.take(v, safe, axis=0) + (1.0 - b2) * g * g
    # Bias correction needs t >= 1; a 0-based step counter would give
    # bc1 = bc2 = 0 and scatter NaN into every touched row. Clamp so a
    # first-call step=0 behaves as step=1 instead of corrupting the table.
    t_f = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
    bc1 = 1.0 - jnp.power(b1, t_f)
    bc2 = 1.0 - jnp.power(b2, t_f)
    upd = lr * (m_rows / bc1) / (jnp.sqrt(v_rows / bc2) + eps)
    droppable = (~valid) | (uniq >= table.shape[0])
    scat = jnp.where(droppable, table.shape[0] + rid, uniq)
    new_m = m.at[scat].set(
        m_rows, mode="drop", indices_are_sorted=True, unique_indices=True
    )
    new_v = v.at[scat].set(
        v_rows, mode="drop", indices_are_sorted=True, unique_indices=True
    )
    new_table = table.at[scat].add(
        (-upd).astype(table.dtype), mode="drop",
        indices_are_sorted=True, unique_indices=True,
    )
    return new_table, new_m, new_v
