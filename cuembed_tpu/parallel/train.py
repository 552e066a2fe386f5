"""Sparse optimizer updates for row-sharded embedding tables.

Completes the multi-chip training story: the forward is served by
:func:`cuembed_tpu.parallel.alltoall_row_sharded_lookup` (or the hybrid
head/tail layout), and the update travels the same wire in the opposite
direction — (row id, gradient row) pairs are routed over ICI to the
shard that OWNS the row, which applies them with the single-chip sparse
machinery (sorted segment sums + row-sparse scatters, deterministic, no
atomics). Neither a dense ``[V, W]`` gradient nor a dense per-shard
``[V/n, W]`` gradient is ever materialized — the routed payload is
``O(nnz * W / n)`` per shard, exactly like the forward responses.

The reference is single-GPU (``/root/reference/README.md:110``); its
per-device backward contract (COO transpose + scatter,
``embedding_lookup_kernels.cuh:175-286``) is what each shard runs
locally here after routing.

Layouts match the router: table ``P(axis, None)`` row-sharded, batch
``P(axis, None)`` data-sharded over the same axis, optimizer state
sharded with the table (row-wise AdaGrad: ``P(axis)``).

Capacity: static per-destination slot count, ``capacity_factor`` times
the balanced share, with the router's collective-safe ``lax.cond``
fallback to full capacity on overflow — always exact.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from cuembed_tpu.ops.lookup_xla import _segment_partials
from cuembed_tpu.parallel.sharding import MODEL_AXIS
from cuembed_tpu.types import CombineMode

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

_SENTINEL = jnp.iinfo(jnp.int32).max


def _bucket(flat, valid, n, rows_per):
    """Owner bucketing, computed ONCE per update (shared by both
    lax.cond branches and the overflow predicate — the forward router's
    structure, ``alltoall_lookup.py``).

    Returns ``(pos_s, counts, starts)``: positions sorted by owner shard,
    per-owner counts, and each owner's run start. Invalid positions
    (hybrid head hits, CSR padding) get owner ``n`` — they sort last and
    never land in a slot or a count.
    """
    nnz_l = flat.shape[0]
    owner = jnp.clip(flat // rows_per, 0, n - 1)
    if valid is not None:
        owner = jnp.where(valid, owner, n)
    _, pos_s = jax.lax.sort(
        [owner, jnp.arange(nnz_l, dtype=jnp.int32)], num_keys=1
    )
    counts = jnp.sum(
        owner[None, :] == jnp.arange(n, dtype=jnp.int32)[:, None], axis=1
    )
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    return pos_s, counts, starts


def _route_grad_rows(
    flat, sample_ids, gy_l, coeff, n, rows_per, cap, axis, width, bucket
):
    """Exchange per-position gradient rows with the owner shards.

    ``flat [nnz_l]`` is in ROUTED row space (global for the plain layout,
    tail space for hybrid); ``sample_ids [nnz_l]`` maps each position to
    its ``gy_l`` row (``pos // hotness`` fixed, CSR row ids ragged);
    ``bucket`` is :func:`_bucket`'s result, computed once outside the
    capacity ``lax.cond``.
    Returns ``(local_rows [n*cap], grad_rows [n*cap, W])`` — the update
    stream addressed to MY table shard (local row space), dead slots
    marked with ``_SENTINEL`` rows and zero gradient.
    """
    nnz_l = flat.shape[0]
    pos_s, counts, starts = bucket

    slot_src = starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    slot_live = jnp.arange(cap, dtype=jnp.int32)[None, :] < counts[:, None]
    slot_pos = jnp.take(pos_s, jnp.clip(slot_src, 0, nnz_l - 1))
    send_idx = jnp.where(slot_live, jnp.take(flat, slot_pos), -1)

    # Per-slot gradient row: coeff_p * grad_y[sample_p] (the position's
    # exact dense-gradient contribution).
    sample_of = jnp.take(sample_ids, slot_pos)
    g = jnp.take(gy_l, sample_of.reshape(-1), axis=0).astype(jnp.float32)
    if coeff is not None:
        g = g * jnp.take(coeff, slot_pos.reshape(-1))[:, None]
    g = jnp.where(slot_live.reshape(-1)[:, None], g, 0.0)

    recv_idx = jax.lax.all_to_all(
        send_idx, axis, split_axis=0, concat_axis=0, tiled=True
    ).reshape(-1)
    recv_g = jax.lax.all_to_all(
        g.reshape(n, cap, width), axis, split_axis=0, concat_axis=0,
        tiled=True,
    ).reshape(n * cap, width)

    shard = jax.lax.axis_index(axis)
    local_rows = jnp.where(
        recv_idx >= 0, recv_idx - shard * rows_per, _SENTINEL
    )
    return local_rows, recv_g


def _prep_coo(idx_l, offs_l, w_l, mode, gy_l):
    """Per-position (flat_idx, sample_ids, coeff, gy, valid).

    Shares the single-chip COO flattening (:func:`cuembed_tpu.train.
    _flatten_coo`): fixed hotness or sharded-CSR block, weights / MEAN /
    CSR liveness folded into ``coeff`` (uniform unweighted coefficients
    fold into ``gy`` instead, saving the per-slot multiply). ``valid``
    masks zero-coefficient positions (CSR padding, zero weights) out of
    the routing slots.
    """
    from cuembed_tpu.train import _flatten_coo

    gy = gy_l.astype(jnp.float32)
    if offs_l is None:
        if w_l is None and mode == CombineMode.MEAN:
            gy = gy * (1.0 / idx_l.shape[1])
        flat, sids, coeff = _flatten_coo(
            idx_l, None, w_l, mode, jnp.float32
        )
    else:
        flat, sids, coeff = _flatten_coo(
            idx_l.reshape(-1), offs_l.reshape(-1),
            None if w_l is None else w_l.reshape(-1), mode, jnp.float32,
        )
    valid = None if coeff is None else (coeff != 0)
    return flat, sids, coeff, gy, valid


def _compressed_local(local_rows, grad_rows):
    """Sorted per-unique-row gradient sums of the routed update stream."""
    m = local_rows.shape[0]
    rows_s, order = jax.lax.sort(
        [local_rows, jnp.arange(m, dtype=jnp.int32)], num_keys=1
    )
    return _segment_partials(grad_rows, rows_s, order, None, None)


def _overflowed(counts, cap, axis):
    """Collective-safe overflow predicate on :func:`_bucket`'s counts."""
    return jax.lax.psum(jnp.any(counts > cap).astype(jnp.int32), axis) > 0


def _update_shapes(table, indices, offsets, n, capacity_factor):
    """Shared validation + capacity sizing for the routed updates."""
    num_rows, width = table.shape
    if num_rows % n != 0:
        raise ValueError("pad table rows to a multiple of the axis size")
    if offsets is not None:
        if indices.ndim != 2 or indices.shape[0] != n:
            raise ValueError(
                "sharded CSR wants indices [n_shards, cap]; see shard_csr"
            )
        nnz_l = indices.shape[1]
    else:
        batch, hotness = indices.shape
        if batch % n != 0:
            raise ValueError("batch must divide evenly across the axis")
        nnz_l = (batch // n) * hotness
    cap = int(nnz_l / n * capacity_factor) + 1
    cap = min(-(-cap // 8) * 8, nnz_l)
    return num_rows // n, width, nnz_l, cap


def sharded_sgd_sparse_update(
    table: jax.Array,
    indices: jax.Array,
    grad_y: jax.Array,
    *,
    mesh: Mesh,
    lr: float,
    offsets: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    mode: CombineMode = CombineMode.SUM,
    capacity_factor: float = 2.0,
    axis: str = MODEL_AXIS,
) -> jax.Array:
    """One sparse SGD step on a row-sharded table.

    Exactly ``table - lr * dense_grad`` (up to fp reassociation) with the
    gradient routed to owner shards — the update mirror of
    :func:`alltoall_row_sharded_lookup`.

    Args:
      table: ``[V, W]``, rows divisible by the axis size, ``P(axis, None)``.
      indices: ``[batch, hotness]`` global ids, ``P(axis, None)``; with
        ``offsets``, the sharded-CSR layout ``[n, cap]`` (see
        :func:`cuembed_tpu.parallel.sharding.shard_csr`).
      grad_y: ``[batch, W]`` pooled-output gradient, ``P(axis, None)``.
      offsets: optional sharded-CSR offsets ``[n, local_batch + 1]``.
      weights / mode: the forward's combine spec (SUM/MEAN; weighted SUM).
      capacity_factor: static per-destination slots as a multiple of the
        balanced share; overflow falls back to full capacity (exact).
    """
    if mode == CombineMode.CONCAT:
        raise ValueError("routed updates pool rows; CONCAT unsupported")
    if weights is not None and mode != CombineMode.SUM:
        raise ValueError("weights are only supported with CombineMode.SUM")
    n = mesh.shape[axis]
    rows_per, width, nnz_l, cap = _update_shapes(
        table, indices, offsets, n, capacity_factor
    )

    in_specs = [P(axis, None), P(axis, None), P(axis, None)]
    args = [table, indices.astype(jnp.int32), grad_y]
    if weights is not None:
        in_specs.append(P(axis, None))
        args.append(weights)
    if offsets is not None:
        in_specs.append(P(axis, None))
        args.append(offsets.astype(jnp.int32))

    def local(table_l, idx_l, gy_l, *rest):
        rest = list(rest)
        w_l = rest.pop(0) if weights is not None else None
        offs_l = rest.pop(0) if offsets is not None else None
        flat, sids, coeff, gy, valid = _prep_coo(
            idx_l, offs_l, w_l, mode, gy_l
        )
        bucket = _bucket(flat, valid, n, rows_per)

        def apply(c):
            return _routed_sgd_apply(
                table_l, flat, sids, gy, coeff, n, rows_per, c, axis,
                width, bucket, lr,
            )

        if cap >= nnz_l:
            return apply(nnz_l)
        return jax.lax.cond(
            _overflowed(bucket[1], cap, axis),
            lambda _: apply(nnz_l), lambda _: apply(cap), 0,
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(axis, None),
        check_vma=False,
    )(*args)


def sharded_rowwise_adagrad_sparse_update(
    table: jax.Array,
    accum: jax.Array,
    indices: jax.Array,
    grad_y: jax.Array,
    *,
    mesh: Mesh,
    lr: float,
    eps: float = 1e-8,
    offsets: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    mode: CombineMode = CombineMode.SUM,
    capacity_factor: float = 2.0,
    axis: str = MODEL_AXIS,
) -> Tuple[jax.Array, jax.Array]:
    """Row-wise AdaGrad on a row-sharded table + co-sharded accumulator.

    Per touched row r (with total gradient row G_r across ALL shards'
    batches): ``accum[r] += mean(G_r^2)``;
    ``table[r] -= lr * G_r / sqrt(accum[r] + eps)`` — identical semantics
    to the single-chip :func:`cuembed_tpu.train.rowwise_adagrad_sparse_update`
    because the routing delivers every shard's contribution to the owner
    BEFORE the per-row sum, so G_r is the global row gradient.

    ``accum``: ``[V]`` fp32, sharded ``P(axis)`` (row-aligned with the
    table).
    """
    if mode == CombineMode.CONCAT:
        raise ValueError("routed updates pool rows; CONCAT unsupported")
    if weights is not None and mode != CombineMode.SUM:
        raise ValueError("weights are only supported with CombineMode.SUM")
    n = mesh.shape[axis]
    if accum.shape[0] != table.shape[0]:
        raise ValueError("accum must be row-aligned with the table")
    rows_per, width, nnz_l, cap = _update_shapes(
        table, indices, offsets, n, capacity_factor
    )

    in_specs = [P(axis, None), P(axis), P(axis, None), P(axis, None)]
    args = [table, accum, indices.astype(jnp.int32), grad_y]
    if weights is not None:
        in_specs.append(P(axis, None))
        args.append(weights)
    if offsets is not None:
        in_specs.append(P(axis, None))
        args.append(offsets.astype(jnp.int32))

    def local(table_l, accum_l, idx_l, gy_l, *rest):
        rest = list(rest)
        w_l = rest.pop(0) if weights is not None else None
        offs_l = rest.pop(0) if offsets is not None else None
        flat, sids, coeff, gy, pvalid = _prep_coo(
            idx_l, offs_l, w_l, mode, gy_l
        )
        bucket = _bucket(flat, pvalid, n, rows_per)

        def apply(c):
            local_rows, grad_rows = _route_grad_rows(
                flat, sids, gy, coeff, n, rows_per, c, axis, width, bucket
            )
            rows, uniq, nu = _compressed_local(local_rows, grad_rows)
            return _compressed_adagrad_apply(
                table_l, accum_l, rows, uniq, nu, lr, eps
            )

        if cap >= nnz_l:
            return apply(nnz_l)
        return jax.lax.cond(
            _overflowed(bucket[1], cap, axis),
            lambda _: apply(nnz_l), lambda _: apply(cap), 0,
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(axis, None), P(axis)),
        check_vma=False,
    )(*args)


def _hybrid_shapes(
    head_table, tail_table, indices, offsets, weights, mode, n,
    cold_frac, capacity_factor,
):
    """Validation + cap sizing shared by the hybrid updates.

    Returns ``(hot, width, rows_per, nnz_l, cap)``.
    """
    if mode == CombineMode.CONCAT:
        raise ValueError("routed updates pool rows; CONCAT unsupported")
    if weights is not None and mode != CombineMode.SUM:
        raise ValueError("weights are only supported with CombineMode.SUM")
    hot, width = head_table.shape
    v_tail = tail_table.shape[0]
    if v_tail % n != 0:
        raise ValueError("pad tail rows to a multiple of the axis size")
    rows_per = v_tail // n
    if offsets is not None:
        if indices.ndim != 2 or indices.shape[0] != n:
            raise ValueError(
                "sharded CSR wants indices [n_shards, cap]; see shard_csr"
            )
        nnz_l = indices.shape[1]
    else:
        batch, hotness = indices.shape
        if batch % n != 0:
            raise ValueError("batch must divide evenly across the axis")
        nnz_l = (batch // n) * hotness
    cap = int(nnz_l / n * min(max(cold_frac, 1e-3), 1.0) * capacity_factor)
    cap = min(max(-(-cap // 8) * 8, 8), nnz_l)
    return hot, width, rows_per, nnz_l, cap


def _routed_sgd_apply(table_l, flat, sids, gy, coeff, n, rows_per, c,
                      axis, width, bucket, lr):
    """Route gradient rows to their owning row shard and scatter-add the
    SGD step — shared by the row-sharded and grid-sharded updates (the
    grid case passes its local width slice as ``width``)."""
    local_rows, grad_rows = _route_grad_rows(
        flat, sids, gy, coeff, n, rows_per, c, axis, width, bucket
    )
    m = local_rows.shape[0]
    rows_s, order = jax.lax.sort(
        [local_rows, jnp.arange(m, dtype=jnp.int32)], num_keys=1
    )
    g = jnp.take(grad_rows, order, axis=0)
    # Sorted scatter-add; sentinel rows drop out of range.
    return table_l.at[rows_s].add(
        (-lr * g).astype(table_l.dtype), mode="drop",
        indices_are_sorted=True,
    )


def _grid_cap(nnz_l, n_r, capacity_factor):
    """Static per-destination slot count for the grid-sharded updates —
    one formula for SGD and AdaGrad so the overflow threshold can never
    drift between the paired paths."""
    cap = int(nnz_l / n_r * capacity_factor) + 1
    return max(min(-(-cap // 8) * 8, nnz_l), 8)


def _compressed_adagrad_apply(table_l, accum_l, rows, uniq, nu, lr, eps,
                              g2_fn=None):
    """Row-wise AdaGrad step on compressed (unique-row, summed-grad)
    lanes — shared by the routed, hybrid-tail, and grid updates.

    ``rows``/``uniq`` from :func:`_compressed_local`; slots at or past
    ``nu`` are dropped via distinct out-of-range scatter targets so the
    index vector stays unique and ascending (the single-chip convention,
    cuembed_tpu/train.py). ``g2_fn`` overrides the per-row ``mean(G^2)``
    statistic — the grid update passes a column-axis psum so the stat
    spans the full row while each chip holds only a width slice.
    """
    k = rows.shape[0]
    rid = jnp.arange(k, dtype=jnp.int32)
    valid = rid < nu
    safe = jnp.where(valid, uniq, 0)
    if g2_fn is None:
        g2_fn = lambda r: jnp.mean(r * r, axis=1)  # noqa: E731
    g2 = g2_fn(rows) * valid
    new_acc_rows = jnp.take(accum_l, safe) + g2
    droppable = (~valid) | (uniq >= accum_l.shape[0])
    scat = jnp.where(droppable, accum_l.shape[0] + rid, uniq)
    new_accum = accum_l.at[scat].set(
        new_acc_rows, mode="drop", indices_are_sorted=True,
        unique_indices=True,
    )
    scale = jnp.where(valid, -lr / jnp.sqrt(new_acc_rows + eps), 0.0)
    new_table = table_l.at[scat].add(
        (rows * scale[:, None]).astype(table_l.dtype),
        mode="drop", indices_are_sorted=True, unique_indices=True,
    )
    return new_table, new_accum


# Head-gradient algorithm switch: the one-hot MXU matmul evaluates a
# [batch, hotness, head] compare cube and a [batch, head] matrix — the
# right shape for an MXU-scale head (~128-16K rows), catastrophic for
# the hybrid layout's VMEM-scale head (~442K rows at 10Mx128 bf16: the
# planner-validation harness measured the hybrid step at 149 ms where
# row-sharded took 25, almost all of it this matmul). Past this bound a
# plain scatter-add of the per-position gradient rows (~11 ns/row) wins
# by orders of magnitude.
HEAD_GRAD_MXU_MAX_ROWS = 16384


def _hybrid_head_grad(head_grad, idx_l, offs_l, flat, sids, coeff, gy, hot):
    """Global head-rows gradient for the hybrid updates, fixed or CSR.

    MXU-scale heads (<= HEAD_GRAD_MXU_MAX_ROWS): one one-hot matmul
    against the local ``grad_y`` (fixed hotness) or the position-major
    variant over gathered per-sample gradient rows (sharded-CSR) — dead
    slots carry coefficient 0, out-of-head rows produce all-zero
    one-hot rows. VMEM-scale heads: gather each position's gradient
    row and scatter-add into ``[hot, W]`` (out-of-head positions route
    to the dropped ``hot`` slot; dead CSR positions carry coefficient
    0).
    """
    if hot <= HEAD_GRAD_MXU_MAX_ROWS:
        if offs_l is None:
            coeff2d = None if coeff is None else coeff.reshape(idx_l.shape)
            return head_grad(idx_l, coeff2d, gy, hot, jnp.float32)
        gy_rows = jnp.take(gy, sids, axis=0)  # [cap, W]
        cpos = (
            coeff
            if coeff is not None
            else jnp.ones((flat.shape[0],), jnp.float32)
        )
        return head_grad(
            flat[:, None], cpos[:, None], gy_rows, hot, jnp.float32
        )
    g = gy.at[sids].get(mode="promise_in_bounds").astype(jnp.float32)
    if coeff is not None:
        g = g * coeff[:, None]
    g = jax.lax.optimization_barrier(g)  # keep gather and scatter split
    tgt = jnp.where(flat < hot, flat, hot)
    return jnp.zeros((hot, gy.shape[1]), jnp.float32).at[tgt].add(
        g, mode="drop"
    )


def sharded_hybrid_sgd_sparse_update(
    head_table: jax.Array,
    tail_table: jax.Array,
    indices: jax.Array,
    grad_y: jax.Array,
    *,
    mesh: Mesh,
    lr: float,
    offsets: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    mode: CombineMode = CombineMode.SUM,
    capacity_factor: float = 2.0,
    cold_frac: float = 1.0,
    axis: str = MODEL_AXIS,
) -> Tuple[jax.Array, jax.Array]:
    """Sparse SGD on the hybrid layout: replicated head + routed tail.

    The update mirror of :func:`hybrid_tiered_lookup`. Head hits (row <
    ``hot``) never touch the wire: each shard computes its local batch's
    head gradient as ONE one-hot MXU matmul (:func:`cuembed_tpu.ops.head.
    head_grad` — the same machinery the single-chip tiered backward
    uses), a ``psum`` over the axis makes it the global head gradient,
    and the replicated head updates densely (zero rows update by zero —
    identical to the row-sparse semantics). Only cold-tail (row, gradient
    row) pairs are routed to their owner shard.

    With ``offsets``: the sharded-CSR layout (``indices [n, cap]`` value
    blocks + ``offsets [n, local_batch+1]`` — see
    :func:`cuembed_tpu.parallel.sharding.shard_csr`); the head gradient
    becomes a position-major one-hot matmul over the gathered per-sample
    gradient rows, dead slots carry coefficient 0 and never route.

    Returns ``(new_head [hot, W] replicated, new_tail sharded)``.
    """
    from cuembed_tpu.ops.head import head_grad

    n = mesh.shape[axis]
    hot, width, rows_per, nnz_l, cap = _hybrid_shapes(
        head_table, tail_table, indices, offsets, weights, mode, n,
        cold_frac, capacity_factor,
    )

    in_specs = [P(None, None), P(axis, None), P(axis, None), P(axis, None)]
    args = [head_table, tail_table, indices.astype(jnp.int32), grad_y]
    if weights is not None:
        in_specs.append(P(axis, None))
        args.append(weights)
    if offsets is not None:
        in_specs.append(P(axis, None))
        args.append(offsets.astype(jnp.int32))

    def local(head_l, tail_l, idx_l, gy_l, *rest):
        rest = list(rest)
        w_l = rest.pop(0) if weights is not None else None
        offs_l = rest.pop(0) if offsets is not None else None
        flat, sids, coeff, gy, pvalid = _prep_coo(
            idx_l, offs_l, w_l, mode, gy_l
        )

        # -- head: one-hot MXU gradient, global via psum ---------------
        hg = _hybrid_head_grad(
            head_grad, idx_l, offs_l, flat, sids, coeff, gy, hot
        )
        hg = jax.lax.psum(hg, axis)
        new_head = head_l - (lr * hg).astype(head_l.dtype)

        # -- tail: route cold positions to their owner -----------------
        is_cold = flat >= hot
        valid = is_cold if pvalid is None else (is_cold & pvalid)
        bucket = _bucket(flat - hot, valid, n, rows_per)

        def apply(c):
            local_rows, grad_rows = _route_grad_rows(
                flat - hot, sids, gy, coeff, n, rows_per, c, axis,
                width, bucket,
            )
            m = local_rows.shape[0]
            rows_s, order = jax.lax.sort(
                [local_rows, jnp.arange(m, dtype=jnp.int32)], num_keys=1
            )
            g = jnp.take(grad_rows, order, axis=0)
            return tail_l.at[rows_s].add(
                (-lr * g).astype(tail_l.dtype), mode="drop",
                indices_are_sorted=True,
            )

        if cap >= nnz_l:
            return new_head, apply(nnz_l)
        new_tail = jax.lax.cond(
            _overflowed(bucket[1], cap, axis),
            lambda _: apply(nnz_l), lambda _: apply(cap), 0,
        )
        return new_head, new_tail

    return shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, None), P(axis, None)),
        check_vma=False,
    )(*args)


def column_sharded_sgd_sparse_update(
    table: jax.Array,
    indices: jax.Array,
    grad_y: jax.Array,
    *,
    mesh: Mesh,
    lr: float,
    offsets: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    mode: CombineMode = CombineMode.SUM,
    data_axis: str = "data",
    model_axis: str = MODEL_AXIS,
) -> jax.Array:
    """Sparse SGD on a column-sharded table (``P(None, model)``).

    The update mirror of :func:`cuembed_tpu.parallel.column_sharded_lookup`:
    the batch COO is all-gathered over the data axis (same volume as a
    data-parallel activation exchange), then every shard applies the
    identical single-chip sparse update to its width slice — replicas of
    the table along the data axis stay bit-identical by construction.
    Row-sharding + routed updates is the production layout; this exists
    for the column layout's symmetry (wide tables whose single rows
    exceed one chip's comfortable tile).

    CSR follows the column LOOKUP's convention — replicated flat CSR:
    ``indices [nnz]`` / ``offsets [batch + 1]`` / ``weights [nnz]`` all
    ``P(None)``, ``grad_y [batch, W]`` ``P(None, model)`` (already
    global, so no data-axis gather is needed).
    """
    if mode == CombineMode.CONCAT:
        raise ValueError("pooled updates only; CONCAT unsupported")
    if weights is not None and mode != CombineMode.SUM:
        raise ValueError("weights are only supported with CombineMode.SUM")
    from cuembed_tpu.train import sgd_sparse_update as _sgd

    if offsets is not None:
        if indices.ndim != 1 or offsets.ndim != 1:
            raise ValueError(
                "column-sharded CSR wants replicated flat CSR "
                "(indices [nnz], offsets [batch+1]) — the "
                "column_sharded_lookup convention"
            )
        in_specs = [P(None, model_axis), P(None), P(None, model_axis)]
        args = [table, indices.astype(jnp.int32), grad_y]
        if weights is not None:
            in_specs.append(P(None))
            args.append(weights)
        in_specs.append(P(None))
        args.append(offsets.astype(jnp.int32))

        def local_csr(table_l, idx_l, gy_l, *rest):
            rest = list(rest)
            w_l = rest.pop(0) if weights is not None else None
            offs_l = rest.pop(0)
            return _sgd(
                table_l, idx_l, gy_l, lr=lr, offsets=offs_l,
                weights=w_l, mode=mode,
            )

        return shard_map(
            local_csr,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=P(None, model_axis),
            check_vma=False,
        )(*args)

    in_specs = [
        P(None, model_axis), P(data_axis, None), P(data_axis, model_axis),
    ]
    args = [table, indices.astype(jnp.int32), grad_y]
    if weights is not None:
        in_specs.append(P(data_axis, None))
        args.append(weights)

    def local(table_l, idx_l, gy_l, *rest):
        w_l = rest[0] if weights is not None else None
        idx_g = jax.lax.all_gather(idx_l, data_axis, axis=0, tiled=True)
        gy_g = jax.lax.all_gather(gy_l, data_axis, axis=0, tiled=True)
        w_g = (
            jax.lax.all_gather(w_l, data_axis, axis=0, tiled=True)
            if w_l is not None
            else None
        )
        return _sgd(table_l, idx_g, gy_g, lr=lr, weights=w_g, mode=mode)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(None, model_axis),
        check_vma=False,
    )(*args)


def column_sharded_rowwise_adagrad_sparse_update(
    table: jax.Array,
    accum: jax.Array,
    indices: jax.Array,
    grad_y: jax.Array,
    *,
    mesh: Mesh,
    lr: float,
    eps: float = 1e-8,
    offsets: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    mode: CombineMode = CombineMode.SUM,
    data_axis: str = "data",
    model_axis: str = MODEL_AXIS,
) -> Tuple[jax.Array, jax.Array]:
    """Row-wise AdaGrad on a column-sharded table.

    The per-row statistic ``mean(G_r^2)`` spans the FULL row, but each
    model shard holds only a width slice — so every shard computes its
    slice's compressed per-row sums from the (all-gathered) global COO
    and the squared-sum is ``psum``-ed over the model axis before the
    accumulator update. The deterministic sort makes the unique-row
    ordering identical on every shard, so the psum-ed vectors align.
    ``accum``: ``[V]`` fp32 replicated (``P(None)``).

    CSR (``offsets``) takes the replicated flat layout of
    :func:`column_sharded_sgd_sparse_update`; the model shards all see
    the identical global COO, so the deterministic sort keeps the
    psum'd unique-row vectors aligned exactly as in the fixed path.
    """
    if mode == CombineMode.CONCAT:
        raise ValueError("pooled updates only; CONCAT unsupported")
    if weights is not None and mode != CombineMode.SUM:
        raise ValueError("weights are only supported with CombineMode.SUM")
    full_width = table.shape[1]

    if offsets is not None:
        if indices.ndim != 1 or offsets.ndim != 1:
            raise ValueError(
                "column-sharded CSR wants replicated flat CSR "
                "(indices [nnz], offsets [batch+1]) — the "
                "column_sharded_lookup convention"
            )
        in_specs = [
            P(None, model_axis), P(None), P(None), P(None, model_axis),
        ]
        args = [table, accum, indices.astype(jnp.int32), grad_y]
        if weights is not None:
            in_specs.append(P(None))
            args.append(weights)
        in_specs.append(P(None))
        args.append(offsets.astype(jnp.int32))
    else:
        in_specs = [
            P(None, model_axis), P(None), P(data_axis, None),
            P(data_axis, model_axis),
        ]
        args = [table, accum, indices.astype(jnp.int32), grad_y]
        if weights is not None:
            in_specs.append(P(data_axis, None))
            args.append(weights)

    def local(table_l, accum_l, idx_l, gy_l, *rest):
        rest = list(rest)
        w_l = rest.pop(0) if weights is not None else None
        if offsets is not None:
            offs_l = rest.pop(0)
            flat, sids, coeff, gy, _ = _prep_coo(
                idx_l, offs_l, w_l, mode, gy_l
            )
        else:
            idx_g = jax.lax.all_gather(
                idx_l, data_axis, axis=0, tiled=True
            )
            gy_g = jax.lax.all_gather(gy_l, data_axis, axis=0, tiled=True)
            w_g = (
                jax.lax.all_gather(w_l, data_axis, axis=0, tiled=True)
                if w_l is not None
                else None
            )
            flat, sids, coeff, gy, _ = _prep_coo(
                idx_g, None, w_g, mode, gy_g
            )
        m = flat.shape[0]
        rows_s, order = jax.lax.sort(
            [flat, jnp.arange(m, dtype=jnp.int32)], num_keys=1
        )
        # Single [m, W] pass: gather + coefficient fold happen inside the
        # segment reduce (the single-chip apply_rest calling convention).
        rows, uniq, nu = _segment_partials(
            gy, rows_s, jnp.take(sids, order),
            None if coeff is None else jnp.take(coeff, order), None,
        )
        rid = jnp.arange(rows.shape[0], dtype=jnp.int32)
        valid = rid < nu
        safe = jnp.where(valid, uniq, 0)
        # Row statistic over the FULL row: psum the slice's squared sum.
        g2 = (
            jax.lax.psum(jnp.sum(rows * rows, axis=1), model_axis)
            / full_width
        ) * valid
        new_acc_rows = jnp.take(accum_l, safe) + g2
        droppable = (~valid) | (uniq >= accum_l.shape[0])
        scat = jnp.where(droppable, accum_l.shape[0] + rid, uniq)
        new_accum = accum_l.at[scat].set(
            new_acc_rows, mode="drop", indices_are_sorted=True,
            unique_indices=True,
        )
        scale = jnp.where(valid, -lr / jnp.sqrt(new_acc_rows + eps), 0.0)
        new_table = table_l.at[scat].add(
            (rows * scale[:, None]).astype(table_l.dtype),
            mode="drop", indices_are_sorted=True, unique_indices=True,
        )
        return new_table, new_accum

    return shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, model_axis), P(None)),
        check_vma=False,
    )(*args)


def sharded_hybrid_rowwise_adagrad_sparse_update(
    head_table: jax.Array,
    tail_table: jax.Array,
    head_accum: jax.Array,
    tail_accum: jax.Array,
    indices: jax.Array,
    grad_y: jax.Array,
    *,
    mesh: Mesh,
    lr: float,
    eps: float = 1e-8,
    offsets: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    mode: CombineMode = CombineMode.SUM,
    capacity_factor: float = 2.0,
    cold_frac: float = 1.0,
    axis: str = MODEL_AXIS,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Row-wise AdaGrad on the hybrid layout: replicated head + routed tail.

    Head: the psum'd one-hot MXU gradient (as in
    :func:`sharded_hybrid_sgd_sparse_update`) is the global per-row
    gradient ``G_r``; the dense AdaGrad step
    ``accum += mean(G_r^2); head -= lr*G_r/sqrt(accum+eps)`` is
    bit-identical to the row-sparse semantics because untouched (or
    cancelled-to-zero) rows add 0 to the accumulator and 0 to the table.
    Every replica computes the same step from the same psum, so head and
    head-accum replicas never diverge.

    Tail: cold (row, gradient-row) pairs route to the owner shard, which
    segment-sums them per unique row BEFORE squaring (``G_r`` is the
    global row gradient, as in
    :func:`sharded_rowwise_adagrad_sparse_update`).

    ``head_accum``: ``[hot]`` fp32 replicated; ``tail_accum``:
    ``[V_tail]`` fp32 sharded ``P(axis)``.

    Returns ``(new_head, new_tail, new_head_accum, new_tail_accum)``.
    """
    from cuembed_tpu.ops.head import head_grad

    n = mesh.shape[axis]
    hot, width, rows_per, nnz_l, cap = _hybrid_shapes(
        head_table, tail_table, indices, offsets, weights, mode, n,
        cold_frac, capacity_factor,
    )
    if (
        head_accum.shape[0] != hot
        or tail_accum.shape[0] != tail_table.shape[0]
    ):
        raise ValueError("accumulators must be row-aligned with the parts")

    in_specs = [
        P(None, None), P(axis, None), P(None), P(axis),
        P(axis, None), P(axis, None),
    ]
    args = [
        head_table, tail_table, head_accum, tail_accum,
        indices.astype(jnp.int32), grad_y,
    ]
    if weights is not None:
        in_specs.append(P(axis, None))
        args.append(weights)
    if offsets is not None:
        in_specs.append(P(axis, None))
        args.append(offsets.astype(jnp.int32))

    def local(head_l, tail_l, hacc_l, tacc_l, idx_l, gy_l, *rest):
        rest = list(rest)
        w_l = rest.pop(0) if weights is not None else None
        offs_l = rest.pop(0) if offsets is not None else None
        flat, sids, coeff, gy, pvalid = _prep_coo(
            idx_l, offs_l, w_l, mode, gy_l
        )

        # -- head: dense AdaGrad on the psum'd one-hot MXU gradient -----
        hg = _hybrid_head_grad(
            head_grad, idx_l, offs_l, flat, sids, coeff, gy, hot
        )
        hg = jax.lax.psum(hg, axis)
        g2 = jnp.mean(hg * hg, axis=1)
        new_hacc = hacc_l + g2
        new_head = head_l - (
            lr * hg / jnp.sqrt(new_hacc + eps)[:, None]
        ).astype(head_l.dtype)

        # -- tail: route cold pairs, compressed AdaGrad at the owner ----
        is_cold = flat >= hot
        valid = is_cold if pvalid is None else (is_cold & pvalid)
        bucket = _bucket(flat - hot, valid, n, rows_per)

        def apply(c):
            local_rows, grad_rows = _route_grad_rows(
                flat - hot, sids, gy, coeff, n, rows_per, c, axis,
                width, bucket,
            )
            rows, uniq, nu = _compressed_local(local_rows, grad_rows)
            return _compressed_adagrad_apply(
                tail_l, tacc_l, rows, uniq, nu, lr, eps
            )

        if cap >= nnz_l:
            new_tail, new_tacc = apply(nnz_l)
        else:
            new_tail, new_tacc = jax.lax.cond(
                _overflowed(bucket[1], cap, axis),
                lambda _: apply(nnz_l), lambda _: apply(cap), 0,
            )
        return new_head, new_tail, new_hacc, new_tacc

    return shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, None), P(axis, None), P(None), P(axis)),
        check_vma=False,
    )(*args)


def _grid_update_shapes(table, indices, offsets, n_r, n_c, capacity_factor):
    """Shared validation + capacity sizing for the grid-routed updates."""
    if table.shape[0] % n_r or table.shape[1] % n_c:
        raise ValueError("pad table rows/cols to multiples of the axes")
    rows_per = table.shape[0] // n_r
    w_local = table.shape[1] // n_c
    if offsets is not None:
        if indices.ndim != 2 or indices.shape[0] != n_r:
            raise ValueError(
                "sharded CSR wants indices [n_shards, cap]; see shard_csr"
            )
        nnz_l = indices.shape[1]
    else:
        batch, hotness = indices.shape
        if batch % n_r != 0:
            raise ValueError("batch must divide evenly across the row axis")
        nnz_l = (batch // n_r) * hotness
    return rows_per, w_local, nnz_l, _grid_cap(nnz_l, n_r, capacity_factor)


def grid_sharded_sgd_sparse_update(
    table: jax.Array,
    indices: jax.Array,
    grad_y: jax.Array,
    *,
    mesh: Mesh,
    lr: float,
    offsets: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    mode: CombineMode = CombineMode.SUM,
    capacity_factor: float = 2.0,
    row_axis: str = MODEL_AXIS,
    col_axis: str = "data",
) -> jax.Array:
    """Sparse SGD on a grid-sharded table ``P(row, col)``.

    The update mirror of
    :func:`cuembed_tpu.parallel.alltoall_lookup.grid_sharded_lookup`:
    each column group routes its own ``[*, W/n_c]`` gradient slices over
    the ROW axis to the owning row shard — nothing crosses the column
    axis (each chip owns its width slice outright).

    With ``offsets``, indices take the sharded-CSR block layout
    ``[n_r, cap]`` / ``[n_r, local_batch + 1]`` (``P(row_axis, None)``,
    replicated over the column axis like fixed-hotness indices);
    ``grad_y`` stays ``[batch, W]`` with ``batch = n_r * local_batch``.
    """
    if mode == CombineMode.CONCAT:
        raise ValueError("routed updates pool rows; CONCAT unsupported")
    if weights is not None and mode != CombineMode.SUM:
        raise ValueError("weights are only supported with CombineMode.SUM")
    n_r = mesh.shape[row_axis]
    n_c = mesh.shape[col_axis]
    rows_per, w_local, nnz_l, cap = _grid_update_shapes(
        table, indices, offsets, n_r, n_c, capacity_factor
    )

    in_specs = [P(row_axis, col_axis), P(row_axis, None),
                P(row_axis, col_axis)]
    args = [table, indices.astype(jnp.int32), grad_y]
    if weights is not None:
        in_specs.append(P(row_axis, None))
        args.append(weights)
    if offsets is not None:
        in_specs.append(P(row_axis, None))
        args.append(offsets.astype(jnp.int32))

    def local(table_l, idx_l, gy_l, *rest):
        rest = list(rest)
        w_l = rest.pop(0) if weights is not None else None
        offs_l = rest.pop(0) if offsets is not None else None
        flat, sids, coeff, gy, valid = _prep_coo(
            idx_l, offs_l, w_l, mode, gy_l
        )
        bucket = _bucket(flat, valid, n_r, rows_per)

        def apply(c):
            return _routed_sgd_apply(
                table_l, flat, sids, gy, coeff, n_r, rows_per, c,
                row_axis, w_local, bucket, lr,
            )

        if cap >= nnz_l:
            return apply(nnz_l)
        return jax.lax.cond(
            _overflowed(bucket[1], cap, row_axis),
            lambda _: apply(nnz_l), lambda _: apply(cap), 0,
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(row_axis, col_axis),
        check_vma=False,
    )(*args)


def grid_sharded_rowwise_adagrad_sparse_update(
    table: jax.Array,
    accum: jax.Array,
    indices: jax.Array,
    grad_y: jax.Array,
    *,
    mesh: Mesh,
    lr: float,
    eps: float = 1e-8,
    offsets: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    mode: CombineMode = CombineMode.SUM,
    capacity_factor: float = 2.0,
    row_axis: str = MODEL_AXIS,
    col_axis: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    """Row-wise AdaGrad on a grid-sharded table.

    Per-row stats span the FULL row, but each chip holds a width slice:
    after routing, the owner computes its slice's per-unique-row squared
    sums and one ``psum`` over the COLUMN axis completes ``mean(G_r^2)``
    — column replicas of the ``P(row)`` accumulator stay identical by
    construction. Sharded-CSR blocks (``offsets``) follow the layout of
    :func:`grid_sharded_sgd_sparse_update`; the blocks are replicated
    over the column axis, so every column group derives the identical
    position stream and the psum'd slots align.
    """
    if mode == CombineMode.CONCAT:
        raise ValueError("routed updates pool rows; CONCAT unsupported")
    if weights is not None and mode != CombineMode.SUM:
        raise ValueError("weights are only supported with CombineMode.SUM")
    n_r = mesh.shape[row_axis]
    n_c = mesh.shape[col_axis]
    if accum.shape[0] != table.shape[0]:
        raise ValueError("accum must be row-aligned with the table")
    full_width = table.shape[1]
    rows_per, w_local, nnz_l, cap = _grid_update_shapes(
        table, indices, offsets, n_r, n_c, capacity_factor
    )

    in_specs = [
        P(row_axis, col_axis), P(row_axis), P(row_axis, None),
        P(row_axis, col_axis),
    ]
    args = [table, accum, indices.astype(jnp.int32), grad_y]
    if weights is not None:
        in_specs.append(P(row_axis, None))
        args.append(weights)
    if offsets is not None:
        in_specs.append(P(row_axis, None))
        args.append(offsets.astype(jnp.int32))

    def local(table_l, accum_l, idx_l, gy_l, *rest):
        rest = list(rest)
        w_l = rest.pop(0) if weights is not None else None
        offs_l = rest.pop(0) if offsets is not None else None
        flat, sids, coeff, gy, valid = _prep_coo(
            idx_l, offs_l, w_l, mode, gy_l
        )
        bucket = _bucket(flat, valid, n_r, rows_per)

        def apply(c):
            local_rows, grad_rows = _route_grad_rows(
                flat, sids, gy, coeff, n_r, rows_per, c, row_axis,
                w_local, bucket,
            )
            rows, uniq, nu = _compressed_local(local_rows, grad_rows)
            # Full-row statistic: psum the slice's squared sums over the
            # column axis (slot order is deterministic given replicated
            # indices, so slots align across column groups).
            return _compressed_adagrad_apply(
                table_l, accum_l, rows, uniq, nu, lr, eps,
                g2_fn=lambda r: jax.lax.psum(
                    jnp.sum(r * r, axis=1), col_axis
                ) / full_width,
            )

        if cap >= nnz_l:
            return apply(nnz_l)
        return jax.lax.cond(
            _overflowed(bucket[1], cap, row_axis),
            lambda _: apply(nnz_l), lambda _: apply(cap), 0,
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(row_axis, col_axis), P(row_axis)),
        check_vma=False,
    )(*args)
