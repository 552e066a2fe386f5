"""All-to-all routed lookup against a row-sharded table.

The production multi-chip embedding pattern (the reference's "future
work", ``README.md:110``), designed TPU-first over ``shard_map`` + XLA
collectives riding ICI:

1. **Bucket**: each shard owns a contiguous row range (``rows_per`` =
   ``num_categories / n_shards``) and a slice of the batch. Local lookup
   indices are bucketed by owner shard into a dest-major ``[n, cap]``
   request block (one local sort by owner + a gather — no scatter).
2. **Route**: one ``lax.all_to_all`` exchanges request blocks.
3. **Serve**: each shard gathers the requested rows from its local table
   slice — this local gather goes through the engine's dispatch, so a
   frequency-ordered local slice can use the tiered path.
4. **Return**: a second ``all_to_all`` ships ``[n, cap, width]`` row
   responses back to the requesters.
5. **Combine**: every original index position knows its (owner, slot)
   coordinate; responses are gathered back per position, scaled by the
   combine coefficient (weights / mean / CSR liveness), and segment-summed
   into ``[local_batch, width]``.

Communication per shard: ``cap * n`` index words out, the same back, and
``cap * n * width`` payload words — proportional to the *lookups actually
routed*, unlike the masked+psum fallback (``row_sharded_lookup``) whose
compute replicates the full batch on every shard.

Capacity: ``cap`` is a static per-destination slot count. With balanced
power-law traffic ``nnz_local / n`` slots (+ margin) suffice; a batch
that overflows any bucket falls back via ``lax.cond`` to the exact
masked+psum path — always correct, slower on pathological skew. Hot-row
skew is better served by combining this with the tiered layout
(replicate the hot head, route only the cold tail) — see
``docs/PERF_NOTES.md``.

Differentiability: built from ``all_to_all``/gather/segment-sum, all of
which JAX transposes; table gradients flow to the owning shard's slice.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

# compress="int8" shares ops/quant.py's per-row symmetric scheme (minimal
# 4-byte scale pad — an all_to_all payload has no VMEM tiling constraint);
# serving_only_guard refuses differentiation, since a silent zero-gradient
# on the routed rows (while the head's gradient still flows) would be easy
# to miss.
from cuembed_tpu.ops.quant import (
    dequantize_rows as _dequant_rows_int8,
    quantize_rows,
    serving_only_guard as _serving_only_guard,
)
from cuembed_tpu.parallel.sharding import MODEL_AXIS
from cuembed_tpu.types import CombineMode

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _coeff_and_samples(idx_l, offs_l, w_l, mode, nnz_l, hotness):
    """Per-position ids + combine coefficients, fixed or sharded-CSR.

    Returns ``(flat, coeff, sample_of_pos, b_l)``; ``sample_of_pos`` is
    None for fixed hotness. CSR dead slots point at row 0 with
    coefficient 0 (they never route and never contribute).
    """
    if offs_l is not None:
        from cuembed_tpu.ops.transforms import extract_row_ids_from_csr

        offs1 = offs_l.reshape(-1)  # [lb + 1]
        b_l = offs1.shape[0] - 1
        flat_raw = idx_l.reshape(-1)  # [nnz_l]
        pos = jnp.arange(nnz_l, dtype=jnp.int32)
        live = pos < offs1[-1]
        flat = jnp.where(live, flat_raw, 0)
        sample_of_pos = extract_row_ids_from_csr(offs1, flat).astype(
            jnp.int32
        )
        coeff = live.astype(jnp.float32)
        if w_l is not None:
            coeff = coeff * w_l.reshape(-1).astype(jnp.float32)
        if mode == CombineMode.MEAN:
            counts = (offs1[1:] - offs1[:-1]).astype(jnp.float32)
            inv = jnp.where(counts == 0, 0.0, 1.0 / jnp.maximum(counts, 1.0))
            coeff = coeff * jnp.take(inv, sample_of_pos)
        return flat, coeff, sample_of_pos, b_l
    b_l = idx_l.shape[0]
    flat = idx_l.reshape(-1)  # [nnz_l]
    coeff = (
        w_l.reshape(-1).astype(jnp.float32)
        if w_l is not None
        else jnp.ones((nnz_l,), jnp.float32)
    )
    if mode == CombineMode.MEAN:
        coeff = coeff / hotness
    return flat, coeff, None, b_l


def _owner_buckets(owner, nnz_l, n, cap):
    """Dest-major slot assignment for the request all-to-all.

    ``owner`` may carry ``n`` for positions that must not route (hybrid
    head hits); they sort last and never land in a slot or a count.
    Returns ``(pos_s, counts, starts, rank, overflow)`` — positions
    sorted by owner, per-owner counts/run starts, each position's rank
    within its owner run, and the static-capacity overflow flag.
    """
    owner_s, pos_s = jax.lax.sort(
        [owner, jnp.arange(nnz_l, dtype=jnp.int32)], num_keys=1
    )
    counts = jnp.sum(
        owner[None, :] == jnp.arange(n, dtype=jnp.int32)[:, None], axis=1
    )  # [n]
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    overflow = jnp.any(counts > cap)
    rank_s = jnp.arange(nnz_l, dtype=jnp.int32) - jnp.take(
        starts, jnp.clip(owner_s, 0, n - 1)
    )
    rank = jnp.zeros((nnz_l,), jnp.int32).at[pos_s].set(rank_s)
    return pos_s, counts, starts, rank, overflow


def _route_serve(
    table_l, send_vals, pos_s, counts, starts, nnz_l, n, c, rows_per,
    width, axis, compress,
):
    """One request/response round trip: ship each destination's slot
    block of row ids over ICI, gather the rows from the owner's local
    slice, and return the responses dest-major (``[n*c, width]``;
    position ``p``'s row sits at ``owner[p]*c + rank[p]``)."""
    slot_src = starts[:, None] + jnp.arange(c, dtype=jnp.int32)[None, :]
    slot_live = jnp.arange(c, dtype=jnp.int32)[None, :] < counts[:, None]
    slot_pos = jnp.take(pos_s, jnp.clip(slot_src, 0, nnz_l - 1))
    send_idx = jnp.where(slot_live, jnp.take(send_vals, slot_pos), -1)
    recv_idx = jax.lax.all_to_all(
        send_idx, axis, split_axis=0, concat_axis=0, tiled=True
    )  # [n, c]: what each peer asked of me
    shard = jax.lax.axis_index(axis)
    local_rows = jnp.clip(
        recv_idx.reshape(-1) - shard * rows_per, 0, rows_per - 1
    )
    served = jnp.take(table_l, local_rows, axis=0)
    served = jnp.where((recv_idx.reshape(-1) >= 0)[:, None], served, 0)
    if compress == "int8":
        qr = jax.lax.all_to_all(
            quantize_rows(_serving_only_guard(served), pad=4).reshape(
                n, c, width + 4
            ),
            axis, split_axis=0, concat_axis=0, tiled=True,
        ).reshape(n * c, width + 4)
        return _dequant_rows_int8(qr, width)
    return jax.lax.all_to_all(
        served.reshape(n, c, width),
        axis, split_axis=0, concat_axis=0, tiled=True,
    ).reshape(n * c, width)


def hybrid_tiered_lookup(
    head_table: jax.Array,
    tail_table: jax.Array,
    indices: jax.Array,
    weights: Optional[jax.Array] = None,
    offsets: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    mode: CombineMode = CombineMode.SUM,
    capacity_factor: float = 2.0,
    cold_frac: float = 1.0,
    axis: str = MODEL_AXIS,
    compress: str = "none",
) -> jax.Array:
    """Replicated-hot-head + all-to-all-routed-cold-tail lookup.

    ``compress="int8"`` quantizes the response payload (the routed rows
    coming back over ICI) to per-row symmetric int8 with inline f32
    scales — (4*W)/(W+4)x less ICI return traffic for an f32 table
    (~3.9x at W=256), elementwise error <= max|row|/254 on routed rows
    only (head-served lookups stay exact). Like the int8 VMEM head
    (:mod:`cuembed_tpu.ops.quant`) this is an opt-in LOSSY serving mode:
    forward only — the quantization round is not differentiable, so
    train with ``compress="none"`` and turn it on for inference.

    The multi-chip expression of the tiered design (the layout
    ``alltoall_row_sharded_lookup``'s docstring recommends): with a
    frequency-ordered table, rows ``[0, hot)`` — the head that serves the
    bulk of power-law traffic — are REPLICATED (one ``[hot, W]`` copy per
    shard, VMEM-sized by construction), so ~90% of lookups are served
    locally at VMEM gather rate with zero communication; only the cold
    tail rows are row-sharded and routed all-to-all. Against full
    routing, both the request/response payload volume and the serve-side
    HBM gathers shrink by the head-traffic fraction.

    Args:
      head_table: ``[hot, W]`` the first ``hot`` frequency-ordered rows,
        replicated (``P(None, None)``).
      tail_table: ``[V_tail, W]`` rows ``hot ..`` of the same table,
        row-sharded ``P(axis, None)``; ``V_tail`` divisible by the axis
        size (pad with :func:`cuembed_tpu.parallel.sharding.pad_table_for_shards`).
      indices: ``[batch, hotness]`` *remapped* (frequency-ordered) global
        row ids, sharded ``P(axis, None)``. With ``offsets``: the
        *sharded-CSR* layout — ``[n, cap]`` flat value blocks (see
        :func:`cuembed_tpu.parallel.sharding.shard_csr`).
      weights: optional, like indices (SUM only).
      offsets: optional sharded-CSR offsets ``[n, local_batch + 1]``;
        entries of a shard's block at or past ``offsets[-1]`` are
        padding (they hit the head with coefficient 0 and never consume
        a routing slot).
      mode: SUM or MEAN.
      capacity_factor: static per-destination slot capacity as a multiple
        of the balanced *cold* share ``cold_frac * nnz_local / n``.
      cold_frac: calibrated fraction of lookups past the head (sizes the
        capacity only; correctness never depends on it — overflow falls
        back to full-capacity routing via ``lax.cond``).
      axis: mesh axis to route over.

    Returns:
      ``[batch, width]`` pooled output, sharded ``P(axis, None)``.

    Differentiable: gradients flow to both table parts (the replicated
    head's gradient is psummed across shards by the shard_map transpose).
    """
    if mode == CombineMode.CONCAT:
        raise ValueError("hybrid routing pools rows; CONCAT unsupported")
    if weights is not None and mode != CombineMode.SUM:
        raise ValueError("weights are only supported with CombineMode.SUM")
    if compress not in ("none", "int8"):
        raise ValueError("compress must be 'none' or 'int8'")
    n = mesh.shape[axis]
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
        hotness = None
    else:
        batch, hotness = indices.shape
        if batch % n != 0:
            raise ValueError("batch must divide evenly across the axis")
        nnz_l = (batch // n) * hotness
    cap = int(nnz_l / n * min(max(cold_frac, 1e-3), 1.0) * capacity_factor)
    cap = min(max(-(-cap // 8) * 8, 8), nnz_l)

    in_specs = [P(None, None), P(axis, None), P(axis, None)]
    args = [head_table, tail_table, indices.astype(jnp.int32)]
    if weights is not None:
        in_specs.append(P(axis, None))
        args.append(weights)
    if offsets is not None:
        in_specs.append(P(axis, None))
        args.append(offsets.astype(jnp.int32))

    def local(head_l, tail_l, idx_l, *rest):
        rest = list(rest)
        w_l = rest.pop(0) if weights is not None else None
        offs_l = rest.pop(0) if offsets is not None else None
        flat, coeff, sample_of_pos, b_l = _coeff_and_samples(
            idx_l, offs_l, w_l, mode, nnz_l, hotness
        )
        is_hot = flat < hot

        def pooled(rows):
            if sample_of_pos is not None:
                return jax.ops.segment_sum(
                    rows, sample_of_pos, num_segments=b_l,
                    indices_are_sorted=True,
                )
            return jnp.sum(rows.reshape(b_l, hotness, width), axis=1)

        # --- head: local VMEM-served pooled lookup, zero communication --
        head_rows = jnp.take(
            head_l, jnp.where(is_hot, flat, 0), axis=0
        ).astype(jnp.float32)
        head_rows = head_rows * jnp.where(is_hot, coeff, 0.0)[:, None]
        out = pooled(head_rows)

        # --- cold tail: bucket by owner (head positions excluded by an
        # out-of-range owner, so they never consume a routing slot) -----
        tail_idx = flat - hot
        owner = jnp.where(
            is_hot, n, jnp.clip(tail_idx // rows_per, 0, n - 1)
        )
        pos_s, counts, starts, rank, overflow = _owner_buckets(
            owner, nnz_l, n, cap
        )

        def route(c):
            resp = _route_serve(
                tail_l, tail_idx, pos_s, counts, starts, nnz_l, n, c,
                rows_per, width, axis, compress,
            )
            slot_of_pos = jnp.clip(owner, 0, n - 1) * c + jnp.clip(
                rank, 0, c - 1
            )
            rows = jnp.take(resp, slot_of_pos, axis=0).astype(jnp.float32)
            rows = rows * jnp.where(is_hot, 0.0, coeff)[:, None]
            return pooled(rows)

        if cap >= nnz_l:
            total = (out + route(nnz_l)).astype(head_table.dtype)
        else:
            overflow_any = (
                jax.lax.psum(overflow.astype(jnp.int32), axis) > 0
            )
            cold = jax.lax.cond(
                overflow_any, lambda _: route(nnz_l), lambda _: route(cap), 0
            )
            total = (out + cold).astype(head_table.dtype)
        # sharded-CSR block convention: [1, local_batch, W] per shard
        return total[None] if sample_of_pos is not None else total

    out_specs = (
        P(axis, None, None) if offsets is not None else P(axis, None)
    )
    return shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_specs,
        check_vma=False,
    )(*args)


def split_hybrid_table(table, hot: int, n_shards: int):
    """Split a frequency-ordered table into (head, padded tail) parts.

    Host-side layout ceremony for :func:`hybrid_tiered_lookup`; place the
    head with ``NamedSharding(mesh, P())`` (replicated) and the tail with
    ``P(axis, None)``.
    """
    from cuembed_tpu.parallel.sharding import pad_table_for_shards

    head = table[:hot]
    tail = pad_table_for_shards(table[hot:], n_shards)
    return head, tail


def alltoall_row_sharded_lookup(
    table: jax.Array,
    indices: jax.Array,
    weights: Optional[jax.Array] = None,
    offsets: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    mode: CombineMode = CombineMode.SUM,
    capacity_factor: float = 2.0,
    axis: str = MODEL_AXIS,
    compress: str = "none",
) -> jax.Array:
    """Pooled lookup with all-to-all index routing.

    ``compress="int8"`` quantizes the response rows over ICI (see
    :func:`hybrid_tiered_lookup` — same scheme, same error bound, same
    forward/serving-only caveat).

    Args:
      table: ``[num_categories, width]``, rows divisible by the axis size,
        sharded ``P(axis, None)`` (row-wise).
      indices: ``[batch, hotness]`` int32 global category ids, sharded
        ``P(axis, None)`` (the batch and the tables live on the same axis).
        With ``offsets``: the *sharded-CSR* layout — ``[n, cap]`` flat
        value blocks, one row per shard (see
        :func:`cuembed_tpu.parallel.sharding.shard_csr`).
      weights: optional, same layout as ``indices`` (SUM only).
      offsets: optional sharded-CSR offsets ``[n, local_batch + 1]``;
        entries of a shard's block at or past ``offsets[-1]`` are padding.
      mode: SUM / MEAN / CONCAT (CONCAT is fixed-hotness, unweighted;
        output is the per-position rows ``[batch*hotness, width]``).
      capacity_factor: static per-destination capacity as a multiple of
        the balanced share ``nnz_local / n``.
      axis: mesh axis name to route over.

    Returns:
      ``[batch, width]`` pooled output, sharded ``P(axis, None)``
      (``[n, local_batch, width]``-shaped for sharded CSR).
    """
    if mode == CombineMode.CONCAT and (
        offsets is not None or weights is not None
    ):
        raise ValueError("CONCAT is fixed-hotness and unweighted")
    if compress not in ("none", "int8"):
        raise ValueError("compress must be 'none' or 'int8'")
    n = mesh.shape[axis]
    num_rows, width = table.shape
    if num_rows % n != 0:
        raise ValueError("pad table rows to a multiple of the axis size")
    rows_per = num_rows // n
    if offsets is not None:
        if indices.ndim != 2 or indices.shape[0] != n:
            raise ValueError(
                "sharded CSR wants indices [n_shards, cap]; see shard_csr"
            )
        nnz_l = indices.shape[1]
        hotness = None
    else:
        batch, hotness = indices.shape
        if batch % n != 0:
            raise ValueError("batch must divide evenly across the axis")
        nnz_l = (batch // n) * hotness
    cap = int(nnz_l / n * capacity_factor) + 1
    cap = min(-(-cap // 8) * 8, nnz_l)

    in_specs = [P(axis, None), P(axis, None)]
    args = [table, indices.astype(jnp.int32)]
    if weights is not None:
        in_specs.append(P(axis, None))
        args.append(weights)
    if offsets is not None:
        in_specs.append(P(axis, None))
        args.append(offsets.astype(jnp.int32))

    def local(table_l, idx_l, *rest):
        rest = list(rest)
        w_l = rest.pop(0) if weights is not None else None
        offs_l = rest.pop(0) if offsets is not None else None
        flat, coeff, sample_of_pos, b_l = _coeff_and_samples(
            idx_l, offs_l, w_l, mode, nnz_l, hotness
        )
        # (CONCAT ignores coeff — per-position rows pass through.)

        owner = jnp.clip(flat // rows_per, 0, n - 1)
        pos_s, counts, starts, rank, overflow = _owner_buckets(
            owner, nnz_l, n, cap
        )

        def route(c):
            resp = _route_serve(
                table_l, flat, pos_s, counts, starts, nnz_l, n, c,
                rows_per, width, axis, compress,
            )
            # combine: position p's response sits at owner[p] * c + rank[p]
            slot_of_pos = owner * c + jnp.clip(rank, 0, c - 1)
            rows = jnp.take(resp, slot_of_pos, axis=0).astype(jnp.float32)
            if mode == CombineMode.CONCAT:
                # Per-position rows ARE the output ([b*h, W], the
                # single-chip convention) — no pooled combine.
                return rows.reshape(b_l * hotness, width)
            rows = rows * coeff[:, None]
            if sample_of_pos is not None:
                out = jax.ops.segment_sum(
                    rows, sample_of_pos, num_segments=b_l,
                    indices_are_sorted=True,
                )
                return out[None]  # [1, local_batch, W] (sharded-CSR block)
            return jnp.sum(rows.reshape(b_l, hotness, width), axis=1)

        if cap >= nnz_l:
            return route(nnz_l).astype(table.dtype)

        # Overflow fallback: identical routing at full capacity
        # (cap = nnz_l can never overflow — a destination holds at most
        # nnz_l requests). Every shard must take the same cond branch
        # (collectives inside), so the predicate is made global.
        overflow_any = jax.lax.psum(overflow.astype(jnp.int32), axis) > 0
        out = jax.lax.cond(
            overflow_any,
            lambda _: route(nnz_l),
            lambda _: route(cap),
            0,
        )
        return out.astype(table.dtype)

    out_specs = (
        P(axis, None, None) if offsets is not None else P(axis, None)
    )
    return shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_specs,
        check_vma=False,
    )(*args)


def grid_sharded_lookup(
    table: jax.Array,
    indices: jax.Array,
    weights: Optional[jax.Array] = None,
    offsets: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    mode: CombineMode = CombineMode.SUM,
    capacity_factor: float = 2.0,
    row_axis: str = MODEL_AXIS,
    col_axis: str = "data",
    gather_output: bool = True,
    compress: str = "none",
) -> jax.Array:
    """Pooled lookup against a GRID-sharded table ``P(row, col)``.

    The combined row x column strategy (torchrec's "grid" sharding) for
    tables whose rows are too wide to serve comfortably from one chip
    even after row sharding: every chip holds a ``[V/n_r, W/n_c]``
    block. Ids route all-to-all over the ROW axis exactly as in
    :func:`alltoall_row_sharded_lookup` — independently within each
    column group, each of which serves its own width slice — so the
    request volume per chip shrinks by ``n_c`` (each id is requested
    once per column group but answered with ``W/n_c`` columns).

    Args:
      table: ``[V, W]``, sharded ``P(row_axis, col_axis)``;
        ``V % n_r == 0`` and ``W % n_c == 0``.
      indices: ``[batch, hotness]``, sharded ``P(row_axis, None)``
        (replicated over the column axis). With ``offsets``: the
        *sharded-CSR* layout ``[n_r, cap]`` (see
        :func:`cuembed_tpu.parallel.sharding.shard_csr`), blocks
        sharded over the ROW axis.
      weights: like indices (SUM only).
      offsets: optional sharded-CSR offsets ``[n_r, local_batch + 1]``,
        ``P(row_axis, None)``.
      gather_output: all-gather the feature slices back to
        ``P(row_axis, None)``; False keeps ``P(row_axis, col_axis)``
        (feed a feature-parallel dense tower directly).
      compress: ``"int8"`` quantizes the routed response payloads over
        ICI (opt-in lossy serving mode, as in
        :func:`alltoall_row_sharded_lookup`).

    Returns:
      ``[batch, W]`` pooled output (or the feature-sharded slice view);
      ``[n_r, local_batch, W]``-shaped for sharded CSR (the routed
      paths' block convention).
    """
    if mode == CombineMode.CONCAT:
        raise ValueError("grid routing pools rows; CONCAT unsupported")
    if weights is not None and mode != CombineMode.SUM:
        raise ValueError("weights are only supported with CombineMode.SUM")
    n_r = mesh.shape[row_axis]
    n_c = mesh.shape[col_axis]
    num_rows, width = table.shape
    if num_rows % n_r != 0 or width % n_c != 0:
        raise ValueError("pad table rows/cols to multiples of the axes")
    rows_per = num_rows // n_r
    w_local = width // n_c
    if offsets is not None:
        if indices.ndim != 2 or indices.shape[0] != n_r:
            raise ValueError(
                "sharded CSR wants indices [n_shards, cap]; see shard_csr"
            )
        nnz_l = indices.shape[1]
        hotness = None
    else:
        batch, hotness = indices.shape
        if batch % n_r != 0:
            raise ValueError("batch must divide evenly across the row axis")
        nnz_l = (batch // n_r) * hotness
    cap = int(nnz_l / n_r * capacity_factor) + 1
    cap = min(-(-cap // 8) * 8, nnz_l)

    in_specs = [P(row_axis, col_axis), P(row_axis, None)]
    args = [table, indices.astype(jnp.int32)]
    if weights is not None:
        in_specs.append(P(row_axis, None))
        args.append(weights)
    if offsets is not None:
        in_specs.append(P(row_axis, None))
        args.append(offsets.astype(jnp.int32))

    def local(table_l, idx_l, *rest):
        rest = list(rest)
        w_l = rest.pop(0) if weights is not None else None
        offs_l = rest.pop(0) if offsets is not None else None
        flat, coeff, sample_of_pos, b_l = _coeff_and_samples(
            idx_l, offs_l, w_l, mode, nnz_l, hotness
        )
        owner = jnp.clip(flat // rows_per, 0, n_r - 1)
        pos_s, counts, starts, rank, overflow = _owner_buckets(
            owner, nnz_l, n_r, cap
        )

        def route(c):
            resp = _route_serve(
                table_l, flat, pos_s, counts, starts, nnz_l, n_r, c,
                rows_per, w_local, row_axis, compress,
            )
            slot_of_pos = owner * c + jnp.clip(rank, 0, c - 1)
            rows = jnp.take(resp, slot_of_pos, axis=0).astype(jnp.float32)
            rows = rows * coeff[:, None]
            if sample_of_pos is not None:
                out = jax.ops.segment_sum(
                    rows, sample_of_pos, num_segments=b_l,
                    indices_are_sorted=True,
                )
                return out[None]  # [1, local_batch, W/n_c] block
            return jnp.sum(rows.reshape(b_l, hotness, w_local), axis=1)

        if cap >= nnz_l:
            out = route(nnz_l)
        else:
            overflow_any = (
                jax.lax.psum(overflow.astype(jnp.int32), row_axis) > 0
            )
            out = jax.lax.cond(
                overflow_any, lambda _: route(nnz_l),
                lambda _: route(cap), 0,
            )
        out = out.astype(table.dtype)
        if gather_output:
            out = jax.lax.all_gather(
                out, col_axis, axis=out.ndim - 1, tiled=True
            )
        return out

    if offsets is not None:
        out_specs = (
            P(row_axis, None, None)
            if gather_output
            else P(row_axis, None, col_axis)
        )
    else:
        out_specs = (
            P(row_axis, None) if gather_output else P(row_axis, col_axis)
        )
    return shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_specs,
        check_vma=False,
    )(*args)
