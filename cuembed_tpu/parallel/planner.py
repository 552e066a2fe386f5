"""Automatic placement planner for multi-table embedding collections.

The reference is single-table, single-GPU (``README.md:110``); in
production GPU recommenders the multi-device placement decision is made
by an external planner (torchrec's ``EmbeddingShardingPlanner`` is the
canonical one). This is the TPU-native analog: given the static
:class:`~cuembed_tpu.collection.TableConfig` set, the mesh geometry and
the measured cost model (``docs/PERF_NOTES.md``), choose per table among

* ``replicated``     — small tables: every shard holds a full copy. Zero
  lookup communication; the sparse update all-gathers the batch COO once
  so replicas stay bit-identical.
* ``row_sharded``    — the production default for big tables: all-to-all
  routed lookups (:func:`~cuembed_tpu.parallel.alltoall_row_sharded_lookup`)
  + routed sparse updates. Per-step wire volume is ``O(nnz * width)`` —
  independent of the table size (PERF_NOTES §routed sparse updates).
* ``hybrid``         — row-sharded with a replicated frequency-ordered
  hot head (:func:`~cuembed_tpu.parallel.hybrid_tiered_lookup`): routed
  volume shrinks by the calibrated head-hit rate. Chosen only when the
  caller supplies a measured hit rate — the planner never guesses skew.
* ``column_sharded`` — very wide tables: the width axis is sliced
  ``P(None, model)`` so a single row never exceeds one chip's tile.
* ``grid_sharded``   — huge AND wide tables (torchrec's "grid"): rows
  over the routing axis x columns over the data axis
  (:func:`~cuembed_tpu.parallel.grid_sharded_lookup`), cutting both the
  per-device footprint and the routed row payload by the column count.
  Opt-in like column sharding (requires a 2D mesh).

:func:`plan` is pure host logic — deterministic and unit-testable with
no devices. :func:`apply_plan` performs the ``device_put`` ceremony.
:func:`planned_lookup` / :func:`planned_sgd_update` /
:func:`planned_adagrad_update` dispatch each table to the lookup/update
its placement requires.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuembed_tpu.collection import TableConfig
from cuembed_tpu.ops.api import embedding_lookup, embedding_lookup_csr
from cuembed_tpu.ops.tiered import DEFAULT_HOT_BYTES
from cuembed_tpu.parallel.alltoall_lookup import (
    alltoall_row_sharded_lookup,
    grid_sharded_lookup,
    hybrid_tiered_lookup,
    split_hybrid_table,
)
from cuembed_tpu.parallel.sharded_lookup import column_sharded_lookup
from cuembed_tpu.parallel.sharding import (
    DATA_AXIS,
    MODEL_AXIS,
    pad_table_for_shards,
)
from cuembed_tpu.parallel.train import (
    column_sharded_rowwise_adagrad_sparse_update,
    column_sharded_sgd_sparse_update,
    grid_sharded_rowwise_adagrad_sparse_update,
    grid_sharded_sgd_sparse_update,
    sharded_hybrid_rowwise_adagrad_sparse_update,
    sharded_hybrid_sgd_sparse_update,
    sharded_rowwise_adagrad_sparse_update,
    sharded_sgd_sparse_update,
)
from cuembed_tpu.train import (
    rowwise_adagrad_sparse_update as _adagrad_1chip,
    sgd_sparse_update as _sgd_1chip,
)
from cuembed_tpu.types import CombineMode

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

LANES = 128

REPLICATED = "replicated"
ROW_SHARDED = "row_sharded"
HYBRID = "hybrid"
COLUMN_SHARDED = "column_sharded"
GRID_SHARDED = "grid_sharded"


class PlanError(ValueError):
    """The requested collection cannot be placed within the budget."""


@dataclass(frozen=True)
class CostModel:
    """Measured per-chip constants the placement decision ranks against.

    Defaults are TPU v5e (the chip all PERF_NOTES numbers come from);
    override per deployment. Only *ratios* matter for placement — the
    absolute comm estimates exist for :meth:`Plan.summary`, not for
    correctness.
    """

    #: physical HBM per chip (v5e: 16 GiB).
    hbm_bytes: int = 16 * 2**30
    #: fraction of HBM the embedding tables may claim (the rest is
    #: activations, the dense tower, XLA scratch).
    hbm_budget_fraction: float = 0.6
    #: biggest per-chip copy worth replicating. Replication buys zero
    #: routing at the cost of n copies; past ~64 MB the HBM spend beats
    #: the saved all-to-all for every measured workload.
    replicate_bytes_max: int = 64 * 2**20
    #: a column slice must keep full 128-lane tiles per shard.
    column_min_slice_lanes: int = LANES
    #: column sharding only pays while the vocab is small (the request
    #: routing it avoids scales with nnz, its output all-gather with
    #: batch*width) — big vocabs always route better row-sharded.
    column_rows_max: int = 1 << 20
    #: head-hit rate below which hybrid's replicated head is not worth
    #: its HBM: the routed-volume saving is proportional to the rate.
    hybrid_min_hit_rate: float = 0.5
    #: fp32 gradient rows ride the update wire (PERF_NOTES §routed).
    grad_elem_bytes: int = 4
    #: all-to-all capacity headroom over the balanced share. 2.0 is a
    #: guess; calibrate from measured traffic with
    #: :func:`cuembed_tpu.utils.frequency.calibrate_capacity_factor`
    #: (frequency-ordered tables concentrate hot rows on shard 0 and
    #: can need much more).
    capacity_factor: float = 2.0
    #: row-sharded per-device footprint above which a grid-eligible
    #: table (wide enough for full lane tiles per column slice) also
    #: shards its width axis. Below this, plain row sharding serves the
    #: table without grid's per-step output all-gather.
    grid_bytes_min: int = 256 * 2**20


@dataclass(frozen=True)
class TablePlan:
    """One table's placement decision and its cost-model estimates."""

    name: str
    placement: str
    bytes_per_device: int
    #: estimated per-device ICI bytes per train step (fwd + sparse SGD).
    comm_bytes_per_step: int
    #: hybrid only: replicated head rows (0 otherwise).
    hot_rows: int = 0
    #: hybrid only: calibrated fraction of lookups served by the head.
    head_hit_rate: float = 0.0


@dataclass(frozen=True)
class Plan:
    """A full placement for a collection over ``n_shards`` devices."""

    tables: Dict[str, TablePlan]
    n_shards: int
    bytes_per_device: int
    budget_bytes: int
    cost: CostModel = field(default_factory=CostModel)
    #: devices along the column (data) axis for grid placements; 1 when
    #: no grid table exists.
    col_shards: int = 1

    def summary(self) -> str:
        lines = [
            f"plan over {self.n_shards} shards: "
            f"{self.bytes_per_device / 2**20:.1f} MB/device of "
            f"{self.budget_bytes / 2**20:.1f} MB budget",
        ]
        for tp in self.tables.values():
            extra = (
                f" hot_rows={tp.hot_rows} hit={tp.head_hit_rate:.2f}"
                if tp.placement == HYBRID
                else ""
            )
            lines.append(
                f"  {tp.name}: {tp.placement:<14} "
                f"{tp.bytes_per_device / 2**20:8.1f} MB/dev  "
                f"~{tp.comm_bytes_per_step / 2**20:.1f} MB/step ICI{extra}"
            )
        return "\n".join(lines)


def _padded_width(width: int) -> int:
    """Physical lane-padded width (TPU arrays tile the last dim to 128)."""
    return -(-width // LANES) * LANES


def plan(
    configs: Sequence[TableConfig],
    n_shards: int,
    *,
    batch: int,
    cost: Optional[CostModel] = None,
    head_hit_rate: Optional[Dict[str, float]] = None,
    hot_bytes_total: int = DEFAULT_HOT_BYTES,
    column_ok: bool = False,
    grid_ok: bool = False,
    col_shards: int = 1,
) -> Plan:
    """Place every table; raise :class:`PlanError` if over budget.

    Args:
      configs: the collection's static table configs (``hotness`` and
        ``traffic_share`` size the communication estimates and the
        hybrid head budget split).
      n_shards: devices along the routing (model) axis.
      batch: global batch size (communication estimates only).
      cost: measured chip constants (defaults = v5e).
      head_hit_rate: per-table calibrated fraction of lookups landing in
        a VMEM-budget frequency-ordered head
        (:func:`cuembed_tpu.utils.frequency.tier_fractions` on real
        traffic). Tables absent from the dict never go hybrid.
      hot_bytes_total: hybrid head HBM budget per device, split across
        hybrid tables by ``traffic_share``.
      column_ok: allow ``column_sharded`` placements (requires the
        caller to run lookups with a 2D (data, model) mesh).
      grid_ok: allow ``grid_sharded`` placements — rows over the model
        axis x columns over ``col_shards`` devices of the data axis.
        Chosen when a table's row-sharded per-device footprint exceeds
        ``cost.grid_bytes_min`` and its width splits into full lane
        tiles; requires a 2D mesh whose data axis has ``col_shards``
        devices. Hybrid wins over grid when a measured head-hit rate
        qualifies the table (skew evidence routes a fraction of the
        traffic; grid always routes all of it).
      col_shards: data-axis device count grid placements divide the
        width over (ignored unless ``grid_ok``).
    """
    cost = cost or CostModel()
    if grid_ok and col_shards < 2:
        raise PlanError("grid_ok requires col_shards >= 2")
    hits = head_hit_rate or {}
    if n_shards < 1:
        raise PlanError("n_shards must be >= 1")

    # Hybrid head budget split by traffic share over ALL tables — the
    # same split EmbeddingCollection.head_hit_rates uses to calibrate
    # the hit rates, so TablePlan.head_hit_rate describes the head the
    # plan actually builds.
    hybrid_names = [
        c.name
        for c in configs
        if hits.get(c.name, 0.0) >= cost.hybrid_min_hit_rate
    ]
    hybrid_share = sum(max(c.traffic_share, 0.0) for c in configs) or 1.0

    tables: Dict[str, TablePlan] = {}
    for c in configs:
        elem = jnp.dtype(c.dtype).itemsize
        pw = _padded_width(c.width)
        total = c.num_categories * pw * elem
        nnz = batch * max(c.hotness, 1)
        nnz_l = -(-nnz // n_shards)
        routed = int(nnz_l * cost.capacity_factor)
        # Routed fwd: ids out + rows back; update: ids + fp32 grad rows
        # (PERF_NOTES §routed sparse updates).
        row_comm = routed * (
            4 + c.width * elem + 4 + c.width * cost.grad_elem_bytes
        )

        def replicated_plan():
            # Update = COO all-gather so replicas stay identical.
            repl_comm = int(
                nnz_l * (4 + c.width * cost.grad_elem_bytes)
                * (n_shards - 1)
            )
            return TablePlan(c.name, REPLICATED, total, repl_comm)

        if total <= cost.replicate_bytes_max or n_shards == 1:
            tables[c.name] = replicated_plan()
            continue

        if (
            column_ok
            and c.num_categories <= cost.column_rows_max
            and c.width >= cost.column_min_slice_lanes * n_shards
            and c.width % n_shards == 0
        ):
            # fwd output all-gather + update COO all-gather.
            col_comm = int(
                (batch * c.width * elem + nnz * (4 + c.width * 4))
                * (n_shards - 1)
                / n_shards
            )
            tables[c.name] = TablePlan(
                c.name, COLUMN_SHARDED, -(-total // n_shards), col_comm
            )
            continue

        hit = hits.get(c.name, 0.0)
        if c.name in hybrid_names:
            budget = int(
                hot_bytes_total * max(c.traffic_share, 0.0) / hybrid_share
            )
            budget_rows = max(budget // (pw * elem), 0) // 8 * 8
            if budget_rows >= c.num_categories:
                # The head budget covers the whole table: a hybrid with
                # an empty tail IS replication — place it as such (an
                # empty tail would make rows_per 0 in the kernels).
                tables[c.name] = replicated_plan()
                continue
            # keep at least one tail row per shard (8-row granules)
            hot_rows = min(
                budget_rows,
                (c.num_categories - 8 * n_shards) // 8 * 8,
            )
            head_bytes = hot_rows * pw * elem
            # Hybrid pays only when the routed volume it removes exceeds
            # the per-step psum of the replicated head's gradient
            # (~2x head bytes: reduce-scatter + all-gather over the axis).
            if hot_rows >= 1024 and hit * row_comm > 2 * head_bytes:
                per_dev = head_bytes + -(-(total - head_bytes) // n_shards)
                comm = int(row_comm * (1.0 - hit)) + head_bytes * 2
                tables[c.name] = TablePlan(
                    c.name, HYBRID, per_dev, comm,
                    hot_rows=hot_rows, head_hit_rate=hit,
                )
                continue

        # Grid is checked AFTER hybrid: a caller-measured head-hit rate
        # is direct evidence that hybrid routes a fraction of the
        # traffic; grid serves the remaining big-and-wide tables (no
        # skew evidence) where the width split cuts both the footprint
        # and the routed payload.
        if (
            grid_ok
            and col_shards > 1
            and -(-total // n_shards) > cost.grid_bytes_min
            and c.width % col_shards == 0
            and c.width >= cost.column_min_slice_lanes * col_shards
        ):
            w_slice = c.width // col_shards
            # ids route once per column group; row/grad payloads carry
            # only the local width slice; gather_output all-gathers the
            # [batch/n_r, W] rows over the column axis.
            grid_comm = routed * (
                4 + w_slice * elem + 4 + w_slice * cost.grad_elem_bytes
            ) + int(
                (batch // n_shards) * c.width * elem
                * (col_shards - 1) / col_shards
            )
            tables[c.name] = TablePlan(
                c.name, GRID_SHARDED,
                -(-total // (n_shards * col_shards)), grid_comm,
            )
            continue

        tables[c.name] = TablePlan(
            c.name, ROW_SHARDED, -(-total // n_shards), row_comm
        )

    per_dev = sum(tp.bytes_per_device for tp in tables.values())
    budget = int(cost.hbm_bytes * cost.hbm_budget_fraction)
    if per_dev > budget:
        worst = sorted(
            tables.values(), key=lambda t: -t.bytes_per_device
        )[:3]
        raise PlanError(
            f"placement needs {per_dev / 2**30:.2f} GiB/device, budget is "
            f"{budget / 2**30:.2f} GiB; largest: "
            + ", ".join(
                f"{t.name}={t.bytes_per_device / 2**20:.0f}MB({t.placement})"
                for t in worst
            )
            + " — add chips, or serve the largest tables host-offloaded "
            "(cuembed_tpu.offload.HostOffloadTable) / int8-quantized "
            "(cuembed_tpu.ops.quant)"
        )
    used_cols = (
        col_shards
        if any(tp.placement == GRID_SHARDED for tp in tables.values())
        else 1
    )
    return Plan(tables, n_shards, per_dev, budget, cost, used_cols)


# --------------------------------------------------------------------------
# Layout ceremony
# --------------------------------------------------------------------------


def apply_plan(
    p: Plan,
    tables: Dict[str, jax.Array],
    mesh: Mesh,
    *,
    axis: str = MODEL_AXIS,
    col_axis: str = DATA_AXIS,
) -> Dict[str, Any]:
    """Place every table per its plan; hybrid becomes a (head, tail) pair.

    Hybrid tables must already be frequency-ordered (hot categories in
    the lowest rows — :meth:`cuembed_tpu.collection.EmbeddingCollection.
    reorder`); the planner cannot verify that, only the calibration that
    produced ``head_hit_rate`` can.
    """
    n = mesh.shape[axis]
    if n != p.n_shards:
        raise PlanError(
            f"plan was built for {p.n_shards} shards, mesh axis "
            f"'{axis}' has {n}"
        )
    if p.col_shards > 1 and mesh.shape.get(col_axis) != p.col_shards:
        raise PlanError(
            f"plan's grid placements want {p.col_shards} column shards, "
            f"mesh axis '{col_axis}' has {mesh.shape.get(col_axis)}"
        )
    placed: Dict[str, Any] = {}
    for name, t in tables.items():
        tp = p.tables[name]
        if tp.placement == REPLICATED:
            placed[name] = jax.device_put(t, NamedSharding(mesh, P()))
        elif tp.placement == ROW_SHARDED:
            placed[name] = jax.device_put(
                pad_table_for_shards(t, n),
                NamedSharding(mesh, P(axis, None)),
            )
        elif tp.placement == HYBRID:
            head, tail = split_hybrid_table(t, tp.hot_rows, n)
            placed[name] = (
                jax.device_put(head, NamedSharding(mesh, P())),
                jax.device_put(tail, NamedSharding(mesh, P(axis, None))),
            )
        elif tp.placement == GRID_SHARDED:
            if t.shape[1] % p.col_shards != 0:
                raise PlanError(
                    f"{name}: width {t.shape[1]} must be a multiple of "
                    f"the column count {p.col_shards} for grid sharding"
                )
            placed[name] = jax.device_put(
                pad_table_for_shards(t, n),
                NamedSharding(mesh, P(axis, col_axis)),
            )
        else:  # COLUMN_SHARDED
            if t.shape[1] % n != 0:
                raise PlanError(
                    f"{name}: width {t.shape[1]} must be a multiple of "
                    f"the axis size {n} for column sharding"
                )
            placed[name] = jax.device_put(
                t, NamedSharding(mesh, P(None, axis))
            )
    return placed


# --------------------------------------------------------------------------
# Planned forward
# --------------------------------------------------------------------------


def planned_lookup(
    p: Plan,
    placed: Dict[str, Any],
    indices: Dict[str, jax.Array],
    weights: Optional[Dict[str, jax.Array]] = None,
    offsets: Optional[Dict[str, jax.Array]] = None,
    *,
    mesh: Mesh,
    modes: Optional[Dict[str, CombineMode]] = None,
    axis: str = MODEL_AXIS,
    data_axis: str = DATA_AXIS,
    compress: str = "none",
) -> Dict[str, jax.Array]:
    """Pooled lookup for every table in ``indices``, by placement.

    Index layouts: routed/replicated tables want the batch sharded over
    ``axis`` (``P(axis, None)``); column-sharded tables want it over
    ``data_axis``. ``compress="int8"`` applies to routed payloads only
    (serving mode — see :func:`hybrid_tiered_lookup`).
    """
    out: Dict[str, jax.Array] = {}
    modes = modes or {}
    for name, idx in indices.items():
        tp = p.tables[name]
        mode = modes.get(name, CombineMode.SUM)
        w = weights.get(name) if weights else None
        off = offsets.get(name) if offsets else None
        if tp.placement == REPLICATED:
            if off is not None and off.ndim == 2:
                # Sharded-CSR blocks (the layout routed tables in the
                # same call require): one lookup per block via vmap;
                # output [n, local_batch, W] matches the routed paths'
                # block convention.
                table_r = placed[name]

                def _blk(i, o, w_):
                    return embedding_lookup_csr(
                        table_r, i, o, w_, mode=mode
                    )

                if w is None:
                    out[name] = jax.vmap(
                        lambda i, o: _blk(i, o, None)
                    )(idx, off)
                else:
                    out[name] = jax.vmap(_blk)(idx, off, w)
            elif off is not None:
                out[name] = embedding_lookup_csr(
                    placed[name], idx, off, w, mode=mode
                )
            else:
                out[name] = embedding_lookup(placed[name], idx, w, mode=mode)
        elif tp.placement == ROW_SHARDED:
            out[name] = alltoall_row_sharded_lookup(
                placed[name], idx, w, off, mesh=mesh, mode=mode,
                capacity_factor=p.cost.capacity_factor, axis=axis,
                compress=compress,
            )
        elif tp.placement == HYBRID:
            head, tail = placed[name]
            out[name] = hybrid_tiered_lookup(
                head, tail, idx, w, off, mesh=mesh, mode=mode,
                capacity_factor=p.cost.capacity_factor,
                cold_frac=max(1.0 - tp.head_hit_rate, 1e-3),
                axis=axis, compress=compress,
            )
        elif tp.placement == GRID_SHARDED:
            out[name] = grid_sharded_lookup(
                placed[name], idx, w, off, mesh=mesh, mode=mode,
                capacity_factor=p.cost.capacity_factor,
                row_axis=axis, col_axis=data_axis, compress=compress,
            )
        else:  # COLUMN_SHARDED
            out[name] = column_sharded_lookup(
                placed[name], idx, w, off, mesh=mesh, mode=mode,
                data_axis=data_axis, model_axis=axis,
            )
    return out


# --------------------------------------------------------------------------
# Planned sparse updates
# --------------------------------------------------------------------------


def _gathered_coo(idx_g, offs_g, w_g, gy_g, mode):
    """Global positions-as-samples COO from all-gathered CSR blocks.

    Each shard-CSR block's liveness/weights/MEAN coefficients fold into
    per-position weights; the per-position gradient row is gathered from
    the global ``grad_y``. Feeding the result to the single-chip sparse
    updates as a ``[nnz, 1]`` batch is exact: SGD is linear in positions,
    and AdaGrad compresses per unique row BEFORE squaring.
    """
    from cuembed_tpu.train import _flatten_coo

    n, lb = offs_g.shape[0], offs_g.shape[1] - 1
    flats, sids, coeffs = [], [], []
    for s in range(n):  # static, small
        f, si, co = _flatten_coo(
            idx_g[s], offs_g[s],
            None if w_g is None else w_g[s], mode, jnp.float32,
        )
        flats.append(f)
        sids.append(si + s * lb)
        coeffs.append(
            co if co is not None
            else jnp.ones((f.shape[0],), jnp.float32)
        )
    flat = jnp.concatenate(flats)
    coeff = jnp.concatenate(coeffs)
    gy_rows = jnp.take(gy_g, jnp.concatenate(sids), axis=0)
    return flat[:, None], gy_rows, coeff[:, None]


def _replicated_sgd(table, idx, gy, *, mesh, lr, weights, offsets, mode, axis):
    """Identical global sparse update on every replica.

    One batch-COO all-gather over ``axis`` (volume ~ ``nnz * width * 4``,
    fine for the small tables that replicate), then the single-chip
    sparse update runs bit-identically on each shard — replicas never
    diverge, matching the psum'd-dense-grad semantics row-sparsely.
    With ``offsets`` (sharded-CSR blocks) the gathered blocks become a
    positions-as-samples COO (:func:`_gathered_coo`).
    """
    in_specs = [P(), P(axis, None), P(axis, None)]
    args = [table, idx.astype(jnp.int32), gy]
    if weights is not None:
        in_specs.append(P(axis, None))
        args.append(weights)
    if offsets is not None:
        in_specs.append(P(axis, None))
        args.append(offsets.astype(jnp.int32))

    def local(t_l, idx_l, gy_l, *rest):
        rest = list(rest)
        w_l = rest.pop(0) if weights is not None else None
        offs_l = rest.pop(0) if offsets is not None else None
        idx_g = jax.lax.all_gather(idx_l, axis, axis=0, tiled=True)
        gy_g = jax.lax.all_gather(gy_l, axis, axis=0, tiled=True)
        w_g = (
            jax.lax.all_gather(w_l, axis, axis=0, tiled=True)
            if w_l is not None
            else None
        )
        if offs_l is not None:
            offs_g = jax.lax.all_gather(offs_l, axis, axis=0, tiled=True)
            pidx, pgy, pw = _gathered_coo(idx_g, offs_g, w_g, gy_g, mode)
            return _sgd_1chip(
                t_l, pidx, pgy, lr=lr, weights=pw, mode=CombineMode.SUM
            )
        return _sgd_1chip(t_l, idx_g, gy_g, lr=lr, weights=w_g, mode=mode)

    return shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs), out_specs=P(),
        check_vma=False,
    )(*args)


def _replicated_adagrad(
    table, accum, idx, gy, *, mesh, lr, eps, weights, offsets, mode, axis
):
    in_specs = [P(), P(), P(axis, None), P(axis, None)]
    args = [table, accum, idx.astype(jnp.int32), gy]
    if weights is not None:
        in_specs.append(P(axis, None))
        args.append(weights)
    if offsets is not None:
        in_specs.append(P(axis, None))
        args.append(offsets.astype(jnp.int32))

    def local(t_l, a_l, idx_l, gy_l, *rest):
        rest = list(rest)
        w_l = rest.pop(0) if weights is not None else None
        offs_l = rest.pop(0) if offsets is not None else None
        idx_g = jax.lax.all_gather(idx_l, axis, axis=0, tiled=True)
        gy_g = jax.lax.all_gather(gy_l, axis, axis=0, tiled=True)
        w_g = (
            jax.lax.all_gather(w_l, axis, axis=0, tiled=True)
            if w_l is not None
            else None
        )
        if offs_l is not None:
            offs_g = jax.lax.all_gather(offs_l, axis, axis=0, tiled=True)
            pidx, pgy, pw = _gathered_coo(idx_g, offs_g, w_g, gy_g, mode)
            return _adagrad_1chip(
                t_l, a_l, pidx, pgy, lr=lr, eps=eps, weights=pw,
                mode=CombineMode.SUM,
            )
        return _adagrad_1chip(
            t_l, a_l, idx_g, gy_g, lr=lr, eps=eps, weights=w_g, mode=mode
        )

    return shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=(P(), P()), check_vma=False,
    )(*args)


def planned_sgd_update(
    p: Plan,
    placed: Dict[str, Any],
    indices: Dict[str, jax.Array],
    grads_y: Dict[str, jax.Array],
    *,
    mesh: Mesh,
    lr: float,
    weights: Optional[Dict[str, jax.Array]] = None,
    offsets: Optional[Dict[str, jax.Array]] = None,
    modes: Optional[Dict[str, CombineMode]] = None,
    axis: str = MODEL_AXIS,
    data_axis: str = DATA_AXIS,
) -> Dict[str, Any]:
    """Sparse SGD for every table in ``grads_y``, by placement."""
    new = dict(placed)
    modes = modes or {}
    for name, gy in grads_y.items():
        tp = p.tables[name]
        mode = modes.get(name, CombineMode.SUM)
        idx = indices[name]
        w = weights.get(name) if weights else None
        off = offsets.get(name) if offsets else None
        if tp.placement == REPLICATED:
            new[name] = _replicated_sgd(
                placed[name], idx, gy, mesh=mesh, lr=lr, weights=w,
                offsets=off, mode=mode, axis=axis,
            )
        elif tp.placement == ROW_SHARDED:
            new[name] = sharded_sgd_sparse_update(
                placed[name], idx, gy, mesh=mesh, lr=lr, offsets=off,
                weights=w, mode=mode,
                capacity_factor=p.cost.capacity_factor, axis=axis,
            )
        elif tp.placement == HYBRID:
            head, tail = placed[name]
            new[name] = sharded_hybrid_sgd_sparse_update(
                head, tail, idx, gy, mesh=mesh, lr=lr, offsets=off,
                weights=w, mode=mode,
                capacity_factor=p.cost.capacity_factor,
                cold_frac=max(1.0 - tp.head_hit_rate, 1e-3),
                axis=axis,
            )
        elif tp.placement == GRID_SHARDED:
            new[name] = grid_sharded_sgd_sparse_update(
                placed[name], idx, gy, mesh=mesh, lr=lr, offsets=off,
                weights=w, mode=mode,
                capacity_factor=p.cost.capacity_factor,
                row_axis=axis, col_axis=data_axis,
            )
        else:  # COLUMN_SHARDED
            # CSR here is the column lookup's replicated-flat layout
            # (indices [nnz], offsets [batch+1]), NOT sharded-CSR blocks.
            new[name] = column_sharded_sgd_sparse_update(
                placed[name], idx, gy, mesh=mesh, lr=lr, offsets=off,
                weights=w, mode=mode, data_axis=data_axis,
                model_axis=axis,
            )
    return new


def planned_adagrad_init(
    p: Plan, placed: Dict[str, Any], mesh: Mesh, *, axis: str = MODEL_AXIS
) -> Dict[str, jax.Array]:
    """Row-wise AdaGrad accumulators, co-sharded with each placement."""
    out: Dict[str, jax.Array] = {}
    for name, tp in p.tables.items():
        if name not in placed:
            continue
        if tp.placement in (ROW_SHARDED, GRID_SHARDED):
            # Grid: row-aligned, replicated over the column axis (the
            # psum'd full-row statistic keeps column replicas identical).
            rows = placed[name].shape[0]
            out[name] = jax.device_put(
                jnp.zeros((rows,), jnp.float32),
                NamedSharding(mesh, P(axis)),
            )
        elif tp.placement == HYBRID:
            head, tail = placed[name]
            out[name] = (
                jax.device_put(
                    jnp.zeros((head.shape[0],), jnp.float32),
                    NamedSharding(mesh, P()),
                ),
                jax.device_put(
                    jnp.zeros((tail.shape[0],), jnp.float32),
                    NamedSharding(mesh, P(axis)),
                ),
            )
        else:  # replicated / column: per-row stats span the full row
            out[name] = jax.device_put(
                jnp.zeros((placed[name].shape[0],), jnp.float32),
                NamedSharding(mesh, P()),
            )
    return out


def planned_adagrad_update(
    p: Plan,
    placed: Dict[str, Any],
    accums: Dict[str, jax.Array],
    indices: Dict[str, jax.Array],
    grads_y: Dict[str, jax.Array],
    *,
    mesh: Mesh,
    lr: float,
    eps: float = 1e-8,
    weights: Optional[Dict[str, jax.Array]] = None,
    offsets: Optional[Dict[str, jax.Array]] = None,
    modes: Optional[Dict[str, CombineMode]] = None,
    axis: str = MODEL_AXIS,
    data_axis: str = DATA_AXIS,
) -> Tuple[Dict[str, Any], Dict[str, jax.Array]]:
    """Row-wise AdaGrad for every table in ``grads_y``, by placement."""
    new_t, new_a = dict(placed), dict(accums)
    modes = modes or {}
    for name, gy in grads_y.items():
        tp = p.tables[name]
        mode = modes.get(name, CombineMode.SUM)
        idx = indices[name]
        w = weights.get(name) if weights else None
        off = offsets.get(name) if offsets else None
        if tp.placement == REPLICATED:
            new_t[name], new_a[name] = _replicated_adagrad(
                placed[name], accums[name], idx, gy, mesh=mesh, lr=lr,
                eps=eps, weights=w, offsets=off, mode=mode, axis=axis,
            )
        elif tp.placement == ROW_SHARDED:
            new_t[name], new_a[name] = (
                sharded_rowwise_adagrad_sparse_update(
                    placed[name], accums[name], idx, gy, mesh=mesh,
                    lr=lr, eps=eps, offsets=off, weights=w, mode=mode,
                    capacity_factor=p.cost.capacity_factor, axis=axis,
                )
            )
        elif tp.placement == HYBRID:
            head, tail = placed[name]
            hacc, tacc = accums[name]
            nh, nt, nha, nta = (
                sharded_hybrid_rowwise_adagrad_sparse_update(
                    head, tail, hacc, tacc, idx, gy, mesh=mesh, lr=lr,
                    eps=eps, offsets=off, weights=w, mode=mode,
                    capacity_factor=p.cost.capacity_factor,
                    cold_frac=max(1.0 - tp.head_hit_rate, 1e-3),
                    axis=axis,
                )
            )
            new_t[name] = (nh, nt)
            new_a[name] = (nha, nta)
        elif tp.placement == GRID_SHARDED:
            new_t[name], new_a[name] = (
                grid_sharded_rowwise_adagrad_sparse_update(
                    placed[name], accums[name], idx, gy, mesh=mesh,
                    lr=lr, eps=eps, offsets=off, weights=w, mode=mode,
                    capacity_factor=p.cost.capacity_factor,
                    row_axis=axis, col_axis=data_axis,
                )
            )
        else:  # COLUMN_SHARDED
            # CSR here is the column lookup's replicated-flat layout.
            new_t[name], new_a[name] = (
                column_sharded_rowwise_adagrad_sparse_update(
                    placed[name], accums[name], idx, gy, mesh=mesh,
                    lr=lr, eps=eps, offsets=off, weights=w, mode=mode,
                    data_axis=data_axis, model_axis=axis,
                )
            )
    return new_t, new_a
