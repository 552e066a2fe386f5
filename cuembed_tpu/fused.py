"""Fused multi-table lookup: many same-width tables as ONE physical table.

Production recommenders run dozens of small embedding tables (DLRM: 26).
Looking each up separately costs a dispatch + a small gather per table;
on TPU the per-call overhead and the per-gather descriptor setup dominate
at that size. Fusion stacks same-(width, dtype) tables row-wise into one
physical table and offsets each table's ids by its base row — after
which every single-table mechanism in this package (tiered engine,
frequency reordering, sharding, the placement planner, sparse updates)
applies to the *fused* table unchanged, and the whole group is served by
ONE lookup and ONE sparse update.

The per-sample combine stays per table: the [batch, H_t] index blocks are
stacked to [batch * T, H_max] (tables with smaller hotness are padded
with zero-coefficient slots), so one fixed-hotness lookup returns
[batch * T, width] = each (sample, table) pooled row.

The reference has no counterpart (single-table, ``README.md:110``); the
GPU analog is torchrec's table grouping / fused kernels.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cuembed_tpu.ops.api import embedding_lookup
from cuembed_tpu.ops.tiered import TieredConfig
from cuembed_tpu.train import (
    rowwise_adagrad_sparse_update,
    sgd_sparse_update,
)
from cuembed_tpu.types import CombineMode


@dataclass(frozen=True)
class FusedSpec:
    """Static layout of a fused table group."""

    names: Tuple[str, ...]
    bases: Tuple[int, ...]          # row offset of each table
    sizes: Tuple[int, ...]          # rows of each table
    hotness: Tuple[int, ...]        # fixed hotness of each table
    width: int
    total_rows: int

    def base_of(self, name: str) -> int:
        return self.bases[self.names.index(name)]


def fuse_tables(
    tables: Dict[str, jax.Array],
    hotness: Dict[str, int],
    names: Optional[Sequence[str]] = None,
) -> Tuple[jax.Array, FusedSpec]:
    """Stack same-(width, dtype) tables row-wise into one fused table.

    Returns ``(fused [sum(V_t), W], spec)``. Order follows ``names``
    (default: dict order) — keep it stable across training steps, the
    bases are baked into the spec.
    """
    names = tuple(names or tables.keys())
    if not names:
        raise ValueError("nothing to fuse")
    width = tables[names[0]].shape[1]
    dtype = tables[names[0]].dtype
    for n in names:
        if tables[n].shape[1] != width or tables[n].dtype != dtype:
            raise ValueError(
                f"table {n!r} has (width, dtype) "
                f"({tables[n].shape[1]}, {tables[n].dtype}); fusion "
                f"requires ({width}, {dtype}) — group tables by shape"
            )
    sizes = tuple(int(tables[n].shape[0]) for n in names)
    bases = tuple(int(b) for b in np.concatenate([[0], np.cumsum(sizes)[:-1]]))
    fused = jnp.concatenate([tables[n] for n in names], axis=0)
    spec = FusedSpec(
        names, bases, sizes, tuple(int(hotness[n]) for n in names),
        width, int(sum(sizes)),
    )
    return fused, spec


def unfuse_table(fused: jax.Array, spec: FusedSpec) -> Dict[str, jax.Array]:
    """Slice the fused table back into its named parts."""
    return {
        n: fused[b : b + s]
        for n, b, s in zip(spec.names, spec.bases, spec.sizes)
    }


def fuse_counts(
    spec: FusedSpec, counts: Dict[str, np.ndarray]
) -> np.ndarray:
    """Concatenate per-table frequency counts into fused-id space.

    Feed to :func:`cuembed_tpu.utils.frequency.frequency_order` to get a
    fused-table reorder + remap; pass the remap to the lookups below to
    run the fused group through the tiered engine.
    """
    parts = []
    for n, s in zip(spec.names, spec.sizes):
        cnt = np.asarray(counts[n])[:s]
        if cnt.shape[0] < s:  # short counts (bincount without minlength)
            cnt = np.pad(cnt, (0, s - cnt.shape[0]))
        parts.append(cnt)
    return np.concatenate(parts)


def _fused_batch(
    spec: FusedSpec,
    indices: Dict[str, jax.Array],
    weights: Optional[Dict[str, jax.Array]],
    mode: CombineMode,
):
    """[batch*T, H_max] fused ids + combine coefficients.

    Slots past a table's hotness carry coefficient 0 and point at the
    table's base row (always a valid id). MEAN folds 1/H_t into the
    coefficients so the lookup itself runs as a weighted SUM.
    """
    if weights is not None and mode != CombineMode.SUM:
        raise ValueError("weights are only supported with CombineMode.SUM")
    T = len(spec.names)
    hmax = max(spec.hotness)
    batch = indices[spec.names[0]].shape[0]
    idx_parts, w_parts = [], []
    uniform = (
        weights is None
        and mode == CombineMode.SUM
        and all(h == hmax for h in spec.hotness)
    )
    for t, n in enumerate(spec.names):
        idx = indices[n]
        if idx.shape != (batch, spec.hotness[t]):
            raise ValueError(
                f"{n}: expected indices [{batch}, {spec.hotness[t]}], "
                f"got {idx.shape}"
            )
        idx = idx.astype(jnp.int32) + spec.bases[t]
        if idx.shape[1] < hmax:
            idx = jnp.concatenate(
                [
                    idx,
                    jnp.full(
                        (batch, hmax - idx.shape[1]),
                        spec.bases[t],
                        jnp.int32,
                    ),
                ],
                axis=1,
            )
        idx_parts.append(idx)
        if not uniform:
            w = (
                weights[n].astype(jnp.float32)
                if weights is not None and weights.get(n) is not None
                else jnp.ones((batch, spec.hotness[t]), jnp.float32)
            )
            if mode == CombineMode.MEAN:
                w = w / max(spec.hotness[t], 1)
            if w.shape[1] < hmax:
                w = jnp.concatenate(
                    [w, jnp.zeros((batch, hmax - w.shape[1]), jnp.float32)],
                    axis=1,
                )
            w_parts.append(w)
    # [batch, T, hmax] -> [batch*T, hmax]: sample-major so out[:, t] slices
    big_idx = jnp.stack(idx_parts, axis=1).reshape(batch * T, hmax)
    big_w = (
        None
        if uniform
        else jnp.stack(w_parts, axis=1).reshape(batch * T, hmax)
    )
    return big_idx, big_w, batch, T


def fused_lookup(
    fused: jax.Array,
    spec: FusedSpec,
    indices: Dict[str, jax.Array],
    weights: Optional[Dict[str, jax.Array]] = None,
    *,
    mode: CombineMode = CombineMode.SUM,
    remap: Optional[jax.Array] = None,
    backend: str = "auto",
    tiered_cfg: Optional[TieredConfig] = None,
    low_precision_math: bool = False,
) -> Dict[str, jax.Array]:
    """Pooled lookup of every table in the group — ONE device lookup.

    ``remap``: fused-id remap (``frequency_order(fuse_counts(...))``)
    when ``fused`` is stored frequency-ordered for the tiered engine;
    applied on-device to the offset ids (one extra 4-byte gather per
    lookup — the host pipeline is still the better place for it).
    ``mode`` applies per table (SUM or MEAN; CONCAT has no pooled shape).
    """
    if mode == CombineMode.CONCAT:
        raise ValueError("fusion pools per (sample, table); CONCAT keeps "
                         "per-row outputs — look those tables up unfused")
    big_idx, big_w, batch, T = _fused_batch(spec, indices, weights, mode)
    if remap is not None:
        big_idx = jnp.asarray(remap)[big_idx]
    out = embedding_lookup(
        fused, big_idx, big_w, mode=CombineMode.SUM if big_w is not None
        else mode, backend=backend, tiered_cfg=tiered_cfg,
        low_precision_math=low_precision_math,
    )
    out = out.reshape(batch, T, spec.width)
    return {n: out[:, t] for t, n in enumerate(spec.names)}


def fused_sgd_update(
    fused: jax.Array,
    spec: FusedSpec,
    indices: Dict[str, jax.Array],
    grads_y: Dict[str, jax.Array],
    *,
    lr: float,
    weights: Optional[Dict[str, jax.Array]] = None,
    mode: CombineMode = CombineMode.SUM,
    remap: Optional[jax.Array] = None,
    tiered_cfg: Optional[TieredConfig] = None,
) -> jax.Array:
    """Sparse SGD for the whole group — ONE sorted-scatter update."""
    big_idx, big_w, big_gy = _fused_grad_batch(
        spec, indices, grads_y, weights, mode, remap
    )
    return sgd_sparse_update(
        fused, big_idx, big_gy, lr=lr, weights=big_w,
        mode=CombineMode.SUM if big_w is not None else mode,
        tiered_cfg=tiered_cfg,
    )


def fused_adagrad_update(
    fused: jax.Array,
    accum: jax.Array,
    spec: FusedSpec,
    indices: Dict[str, jax.Array],
    grads_y: Dict[str, jax.Array],
    *,
    lr: float,
    eps: float = 1e-8,
    weights: Optional[Dict[str, jax.Array]] = None,
    mode: CombineMode = CombineMode.SUM,
    remap: Optional[jax.Array] = None,
    tiered_cfg: Optional[TieredConfig] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Row-wise AdaGrad for the whole group — ONE state update."""
    big_idx, big_w, big_gy = _fused_grad_batch(
        spec, indices, grads_y, weights, mode, remap
    )
    return rowwise_adagrad_sparse_update(
        fused, accum, big_idx, big_gy, lr=lr, eps=eps, weights=big_w,
        mode=CombineMode.SUM if big_w is not None else mode,
        tiered_cfg=tiered_cfg,
    )


# ---------------------------------------------------------------------------
# Multi-chip mirrors: the fused group on a row-sharded fused table
# ---------------------------------------------------------------------------


def fused_sharded_lookup(
    fused: jax.Array,
    spec: FusedSpec,
    indices: Dict[str, jax.Array],
    weights: Optional[Dict[str, jax.Array]] = None,
    *,
    mesh,
    mode: CombineMode = CombineMode.SUM,
    remap: Optional[jax.Array] = None,
    capacity_factor: float = 2.0,
    axis: str = "model",
    compress: str = "none",
) -> Dict[str, jax.Array]:
    """Routed pooled lookup of the whole group — ONE all-to-all.

    The multi-chip mirror of :func:`fused_lookup`: ``fused`` lives
    row-sharded ``P(axis, None)`` (pad rows with
    :func:`cuembed_tpu.parallel.pad_table_for_shards`), the stacked
    ``[batch*T, H_max]`` group batch rides one
    :func:`~cuembed_tpu.parallel.alltoall_row_sharded_lookup` — T
    routed dispatches become one. The axis size must divide
    ``batch * T``.
    """
    if mode == CombineMode.CONCAT:
        raise ValueError("fusion pools per (sample, table); CONCAT keeps "
                         "per-row outputs — look those tables up unfused")
    from cuembed_tpu.parallel.alltoall_lookup import (
        alltoall_row_sharded_lookup,
    )

    big_idx, big_w, batch, T = _fused_batch(spec, indices, weights, mode)
    if remap is not None:
        big_idx = jnp.asarray(remap)[big_idx]
    out = alltoall_row_sharded_lookup(
        fused, big_idx, big_w, None, mesh=mesh,
        mode=CombineMode.SUM if big_w is not None else mode,
        capacity_factor=capacity_factor, axis=axis, compress=compress,
    )
    out = out.reshape(batch, T, spec.width)
    return {n: out[:, t] for t, n in enumerate(spec.names)}


def _fused_grad_batch(spec, indices, grads_y, weights, mode, remap):
    big_idx, big_w, batch, T = _fused_batch(spec, indices, weights, mode)
    if remap is not None:
        big_idx = jnp.asarray(remap)[big_idx]
    big_gy = jnp.stack(
        [grads_y[n] for n in spec.names], axis=1
    ).reshape(batch * T, spec.width)
    return big_idx, big_w, big_gy


def fused_sharded_sgd_update(
    fused: jax.Array,
    spec: FusedSpec,
    indices: Dict[str, jax.Array],
    grads_y: Dict[str, jax.Array],
    *,
    mesh,
    lr: float,
    weights: Optional[Dict[str, jax.Array]] = None,
    mode: CombineMode = CombineMode.SUM,
    remap: Optional[jax.Array] = None,
    capacity_factor: float = 2.0,
    axis: str = "model",
) -> jax.Array:
    """Sparse SGD for the whole group — ONE routed scatter update."""
    from cuembed_tpu.parallel.train import sharded_sgd_sparse_update

    big_idx, big_w, big_gy = _fused_grad_batch(
        spec, indices, grads_y, weights, mode, remap
    )
    return sharded_sgd_sparse_update(
        fused, big_idx, big_gy, mesh=mesh, lr=lr, weights=big_w,
        mode=CombineMode.SUM if big_w is not None else mode,
        capacity_factor=capacity_factor, axis=axis,
    )


def fused_sharded_adagrad_update(
    fused: jax.Array,
    accum: jax.Array,
    spec: FusedSpec,
    indices: Dict[str, jax.Array],
    grads_y: Dict[str, jax.Array],
    *,
    mesh,
    lr: float,
    eps: float = 1e-8,
    weights: Optional[Dict[str, jax.Array]] = None,
    mode: CombineMode = CombineMode.SUM,
    remap: Optional[jax.Array] = None,
    capacity_factor: float = 2.0,
    axis: str = "model",
) -> Tuple[jax.Array, jax.Array]:
    """Row-wise AdaGrad for the whole group — ONE routed state update.

    ``accum`` is row-aligned with the (padded) fused table, co-sharded
    ``P(axis)``.
    """
    from cuembed_tpu.parallel.train import (
        sharded_rowwise_adagrad_sparse_update,
    )

    big_idx, big_w, big_gy = _fused_grad_batch(
        spec, indices, grads_y, weights, mode, remap
    )
    return sharded_rowwise_adagrad_sparse_update(
        fused, accum, big_idx, big_gy, mesh=mesh, lr=lr, eps=eps,
        weights=big_w,
        mode=CombineMode.SUM if big_w is not None else mode,
        capacity_factor=capacity_factor, axis=axis,
    )
