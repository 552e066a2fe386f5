"""Multi-table embedding collection.

The reference's support matrix defers multi-table to "Future Release"
(``README.md:110``); this is that layer, TPU-first: a set of named
embedding tables managed together —

* per-table tiered configs carved out of one shared VMEM hot-head budget
  (proportional to each table's traffic share),
* host-side frequency statistics and layout maintenance (reordering a
  table + its id->row remap without changing lookup results),
* collection-wide forward (`apply`) and row-sparse training updates
  (`sgd_update`, `adagrad_*`) built on :mod:`cuembed_tpu.train`,
* sharding-friendly: tables are plain pytree leaves, so
  ``jax.device_put`` with row/column shardings from
  :mod:`cuembed_tpu.parallel` applies per table.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cuembed_tpu.ops.api import embedding_lookup, embedding_lookup_csr
from cuembed_tpu.ops.tiered import DEFAULT_HOT_BYTES, TieredConfig, auto_config
from cuembed_tpu.train import (
    rowwise_adagrad_init,
    rowwise_adagrad_sparse_update,
    sgd_sparse_update,
)
from cuembed_tpu.types import CombineMode
from cuembed_tpu.utils import frequency as freq

LANES = 128


@dataclass(frozen=True)
class TableConfig:
    """One table's static configuration."""

    name: str
    num_categories: int
    width: int
    mode: CombineMode = CombineMode.SUM
    dtype: object = jnp.float32
    hotness: int = 1            # expected hotness (capacity planning only)
    traffic_share: float = 1.0  # relative lookup volume (hot-budget split)
    #: features served by this table (torchrec's shared-table pattern —
    #: e.g. one "video_id" table behind "watched", "liked", "shared"
    #: features). Empty = one feature named like the table. Used by the
    #: ``*_features`` entry points; the per-table API ignores it.
    feature_names: Tuple[str, ...] = ()


class EmbeddingCollection:
    """A set of named embedding tables managed as one unit."""

    def __init__(
        self,
        configs: Sequence[TableConfig],
        *,
        hot_bytes_total: int = DEFAULT_HOT_BYTES,
        cold_fraction: float = 0.25,
        head_fraction: float = 0.45,
    ):
        names = [c.name for c in configs]
        if len(set(names)) != len(names):
            raise ValueError("table names must be unique")
        self.configs: Dict[str, TableConfig] = {c.name: c for c in configs}
        self.feature_to_table: Dict[str, str] = {}
        for c in configs:
            for f in (c.feature_names or (c.name,)):
                if f in self.feature_to_table:
                    raise ValueError(
                        f"feature {f!r} claimed by both "
                        f"{self.feature_to_table[f]!r} and {c.name!r}"
                    )
                self.feature_to_table[f] = c.name
        total_share = sum(max(c.traffic_share, 0.0) for c in configs) or 1.0
        self.tiered: Dict[str, Optional[TieredConfig]] = {}
        for c in configs:
            budget = int(hot_bytes_total * max(c.traffic_share, 0.0) / total_share)
            self.tiered[c.name] = auto_config(
                c.num_categories,
                c.width,
                jnp.dtype(c.dtype).itemsize,
                c.hotness,
                cold_fraction=cold_fraction,
                head_fraction=head_fraction,
                hot_bytes=max(budget, 1),
                # a table only counts as "fully VMEM-served" if it fits
                # its own share of the collection budget
                vmem_table_bytes=max(budget, 1),
            )

    # -- params ------------------------------------------------------------
    def init(self, key: jax.Array) -> Dict[str, jax.Array]:
        keys = jax.random.split(key, len(self.configs))
        tables = {}
        for k, (name, c) in zip(keys, self.configs.items()):
            scale = 1.0 / (c.width**0.5)
            tables[name] = jax.random.uniform(
                k, (c.num_categories, c.width), jnp.float32, -scale, scale
            ).astype(c.dtype)
        return tables

    # -- frequency layout maintenance (host side) ---------------------------
    def init_counts(self) -> Dict[str, np.ndarray]:
        return {
            name: np.zeros((c.num_categories,), np.int64)
            for name, c in self.configs.items()
        }

    def update_counts(
        self, counts: Dict[str, np.ndarray], indices: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        for name, idx in indices.items():
            counts[name] = freq.count_frequencies(
                idx, self.configs[name].num_categories, counts[name]
            )
        return counts

    def reorder(
        self, tables: Dict[str, jax.Array], counts: Dict[str, np.ndarray]
    ) -> Tuple[Dict[str, jax.Array], Dict[str, np.ndarray]]:
        """Frequency-reorder every table; returns (tables, remaps).

        ``lookup(reordered[name], remap[name][idx])`` equals
        ``lookup(original[name], idx)``. Remaps are host numpy — apply
        them in the input pipeline (:mod:`cuembed_tpu.native`).
        """
        new_tables, remaps = {}, {}
        for name, t in tables.items():
            perm, remap = freq.frequency_order(counts[name])
            new_tables[name] = jnp.asarray(np.asarray(t)[perm])
            remaps[name] = remap
        return new_tables, remaps

    # -- placement planning ---------------------------------------------------
    def head_hit_rates(
        self,
        counts: Dict[str, np.ndarray],
        *,
        hot_bytes_total: int = DEFAULT_HOT_BYTES,
    ) -> Dict[str, float]:
        """Per-table head-hit rate from observed frequency counts.

        For each table: the fraction of observed traffic that a
        frequency-ordered head sized to this table's traffic share of
        ``hot_bytes_total`` would serve — exactly what
        :func:`cuembed_tpu.parallel.planner.plan` wants as
        ``head_hit_rate`` to judge hybrid placement.

        Tables without enough evidence are omitted (no hybrid without
        statistics): on a small sample the top-``hot_rows`` empirical
        mass is ~100% for *any* distribution — a uniform table would
        masquerade as perfectly skewed. Evidence means either >2x the
        head size in DISTINCT observed categories, or >=16x the head
        size in total observations (high volume concentrated on few
        distinct ids is itself proof of skew — an ultra-concentrated
        table must not be disqualified by its own concentration).
        """
        total_share = sum(
            max(c.traffic_share, 0.0) for c in self.configs.values()
        ) or 1.0
        out: Dict[str, float] = {}
        for name, c in self.configs.items():
            cnt = counts.get(name)
            if cnt is None or cnt.sum() == 0:
                continue
            pw = -(-c.width // LANES) * LANES
            budget = int(
                hot_bytes_total * max(c.traffic_share, 0.0) / total_share
            )
            hot_rows = max(
                budget // (pw * jnp.dtype(c.dtype).itemsize), 0
            ) // 8 * 8
            if hot_rows <= 0:
                continue
            cnt = np.asarray(cnt)
            if (
                np.count_nonzero(cnt) <= 2 * hot_rows
                and cnt.sum() < 16 * hot_rows
            ):
                continue  # insufficient evidence (see docstring)
            top = np.sort(cnt)[::-1][:hot_rows]
            out[name] = float(top.sum() / cnt.sum())
        return out

    def plan_placement(
        self,
        n_shards: int,
        *,
        batch: int,
        counts: Optional[Dict[str, np.ndarray]] = None,
        cost=None,
        column_ok: bool = False,
        grid_ok: bool = False,
        col_shards: int = 1,
        hot_bytes_total: int = DEFAULT_HOT_BYTES,
    ):
        """Place this collection over ``n_shards`` devices.

        With ``counts`` (from :meth:`update_counts`), hybrid placement is
        considered using the measured head-hit rates; without stats no
        table goes hybrid. Returns a
        :class:`cuembed_tpu.parallel.planner.Plan` — feed it to
        :func:`~cuembed_tpu.parallel.planner.apply_plan` and the
        ``planned_*`` entry points.
        """
        from cuembed_tpu.parallel.planner import plan

        hits = (
            self.head_hit_rates(counts, hot_bytes_total=hot_bytes_total)
            if counts
            else None
        )
        return plan(
            list(self.configs.values()),
            n_shards,
            batch=batch,
            cost=cost,
            head_hit_rate=hits,
            hot_bytes_total=hot_bytes_total,
            column_ok=column_ok,
            grid_ok=grid_ok,
            col_shards=col_shards,
        )

    # -- forward -------------------------------------------------------------
    def apply(
        self,
        tables: Dict[str, jax.Array],
        indices: Dict[str, jax.Array],
        weights: Optional[Dict[str, jax.Array]] = None,
        offsets: Optional[Dict[str, jax.Array]] = None,
        *,
        backend: str = "auto",
        tiered: bool = False,
    ) -> Dict[str, jax.Array]:
        """Pooled lookup for every table present in ``indices``.

        ``tiered=True`` engages each table's tiered config (requires
        frequency-ordered tables + remapped ids — see :meth:`reorder`).
        """
        out = {}
        for name, idx in indices.items():
            c = self.configs[name]
            w = weights.get(name) if weights else None
            off = offsets.get(name) if offsets else None
            tc = (
                self.tiered[name]
                if (tiered and c.mode != CombineMode.CONCAT)
                else None
            )
            be = "tiered" if tc is not None else backend
            if off is not None:
                out[name] = embedding_lookup_csr(
                    tables[name], idx, off, w, mode=c.mode,
                    backend=be, tiered_cfg=tc,
                )
            else:
                out[name] = embedding_lookup(
                    tables[name], idx, w, mode=c.mode,
                    backend=be, tiered_cfg=tc,
                )
        return out

    # -- feature-level entry points (shared tables) ---------------------------
    def apply_features(
        self,
        tables: Dict[str, jax.Array],
        indices: Dict[str, jax.Array],
        weights: Optional[Dict[str, jax.Array]] = None,
        offsets: Optional[Dict[str, jax.Array]] = None,
        *,
        backend: str = "auto",
        tiered: bool = False,
    ) -> Dict[str, jax.Array]:
        """Pooled lookup per FEATURE; features resolve to their shared
        table (``TableConfig.feature_names``). Output keyed by feature."""
        out = {}
        for f, idx in indices.items():
            name = self.feature_to_table[f]
            c = self.configs[name]
            w = weights.get(f) if weights else None
            off = offsets.get(f) if offsets else None
            tc = (
                self.tiered[name]
                if (tiered and c.mode != CombineMode.CONCAT)
                else None
            )
            be = "tiered" if tc is not None else backend
            if off is not None:
                out[f] = embedding_lookup_csr(
                    tables[name], idx, off, w, mode=c.mode,
                    backend=be, tiered_cfg=tc,
                )
            else:
                out[f] = embedding_lookup(
                    tables[name], idx, w, mode=c.mode,
                    backend=be, tiered_cfg=tc,
                )
        return out

    def update_counts_features(
        self, counts: Dict[str, np.ndarray], indices: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        """Aggregate per-FEATURE draws into each shared table's counts."""
        for f, idx in indices.items():
            name = self.feature_to_table[f]
            counts[name] = freq.count_frequencies(
                idx, self.configs[name].num_categories, counts[name]
            )
        return counts

    def _features_coo(self, name, indices, grads_y, weights, offsets):
        """Joint positions-as-samples COO over every feature of table
        ``name`` present in ``grads_y``.

        Gradients from all features of a shared table are SUMMED before
        the optimizer step (the torchrec semantics): each feature's
        (position -> row, coefficient) pairs and per-position gradient
        rows concatenate into ONE batch, so AdaGrad sees the joint
        per-row gradient, not a sequence of partial ones.
        """
        from cuembed_tpu.train import _flatten_coo

        c = self.configs[name]
        if c.mode == CombineMode.CONCAT:
            raise ValueError(
                "feature-level updates pool per sample; CONCAT tables "
                "have per-position outputs — update them per table"
            )
        feats = [
            f for f in (c.feature_names or (c.name,)) if f in grads_y
        ]
        if not feats:
            return None
        flats, rows, coeffs = [], [], []
        for f in feats:
            idx = indices[f]
            w = weights.get(f) if weights else None
            off = offsets.get(f) if offsets else None
            gy = grads_y[f].astype(jnp.float32)
            if off is None and w is None and c.mode == CombineMode.MEAN:
                gy = gy * (1.0 / idx.shape[1])
            flat, sids, coeff = _flatten_coo(
                idx, off, w, c.mode, jnp.float32
            )
            flats.append(flat)
            rows.append(jnp.take(gy, sids, axis=0))
            coeffs.append(
                coeff if coeff is not None
                else jnp.ones((flat.shape[0],), jnp.float32)
            )
        return (
            jnp.concatenate(flats)[:, None],
            jnp.concatenate(rows, axis=0),
            jnp.concatenate(coeffs)[:, None],
        )

    def sgd_update_features(
        self,
        tables: Dict[str, jax.Array],
        indices: Dict[str, jax.Array],
        grads_y: Dict[str, jax.Array],
        *,
        lr: float,
        weights: Optional[Dict[str, jax.Array]] = None,
        offsets: Optional[Dict[str, jax.Array]] = None,
    ) -> Dict[str, jax.Array]:
        """Sparse SGD with per-FEATURE gradients on shared tables —
        one joint update per table."""
        new = dict(tables)
        for name in {self.feature_to_table[f] for f in grads_y}:
            coo = self._features_coo(
                name, indices, grads_y, weights, offsets
            )
            if coo is None:
                continue
            pidx, pgy, pw = coo
            new[name] = sgd_sparse_update(
                tables[name], pidx, pgy, lr=lr, weights=pw,
                mode=CombineMode.SUM,
            )
        return new

    def adagrad_update_features(
        self,
        tables: Dict[str, jax.Array],
        accums: Dict[str, jax.Array],
        indices: Dict[str, jax.Array],
        grads_y: Dict[str, jax.Array],
        *,
        lr: float,
        eps: float = 1e-8,
        weights: Optional[Dict[str, jax.Array]] = None,
        offsets: Optional[Dict[str, jax.Array]] = None,
    ) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
        """Row-wise AdaGrad with per-FEATURE gradients on shared tables.

        Exact joint-batch semantics: the per-row gradient is summed
        across features BEFORE squaring (the compressed lanes do that by
        construction), matching a fused single-batch step.
        """
        new_t, new_a = dict(tables), dict(accums)
        for name in {self.feature_to_table[f] for f in grads_y}:
            coo = self._features_coo(
                name, indices, grads_y, weights, offsets
            )
            if coo is None:
                continue
            pidx, pgy, pw = coo
            new_t[name], new_a[name] = rowwise_adagrad_sparse_update(
                tables[name], accums[name], pidx, pgy, lr=lr, eps=eps,
                weights=pw, mode=CombineMode.SUM,
            )
        return new_t, new_a

    # -- sparse training ------------------------------------------------------
    def sgd_update(
        self,
        tables: Dict[str, jax.Array],
        indices: Dict[str, jax.Array],
        grads_y: Dict[str, jax.Array],
        *,
        lr: float,
        weights: Optional[Dict[str, jax.Array]] = None,
        offsets: Optional[Dict[str, jax.Array]] = None,
        tiered: bool = False,
    ) -> Dict[str, jax.Array]:
        new = dict(tables)
        for name, gy in grads_y.items():
            c = self.configs[name]
            new[name] = sgd_sparse_update(
                tables[name],
                indices[name],
                gy,
                lr=lr,
                offsets=offsets.get(name) if offsets else None,
                weights=weights.get(name) if weights else None,
                mode=c.mode,
                tiered_cfg=self.tiered[name] if tiered else None,
            )
        return new

    def adagrad_init(self) -> Dict[str, jax.Array]:
        return {
            name: rowwise_adagrad_init(c.num_categories)
            for name, c in self.configs.items()
        }

    # -- multi-chip (row-sharded tables over a mesh axis) --------------------
    def shard(
        self, tables: Dict[str, jax.Array], mesh, *, axis: str = "model"
    ) -> Dict[str, jax.Array]:
        """Place every table row-sharded ``P(axis, None)`` over ``mesh``.

        Rows are padded to a multiple of the axis size (padding rows are
        never addressed — ids stay in ``[0, num_categories)``). Feed the
        result to :meth:`apply_sharded` / :meth:`adagrad_update_sharded`.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cuembed_tpu.parallel import pad_table_for_shards

        n = mesh.shape[axis]
        sh = NamedSharding(mesh, P(axis, None))
        return {
            name: jax.device_put(pad_table_for_shards(t, n), sh)
            for name, t in tables.items()
        }

    def adagrad_init_sharded(
        self, mesh, *, axis: str = "model"
    ) -> Dict[str, jax.Array]:
        """Accumulators row-aligned with :meth:`shard`'s padded tables."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = mesh.shape[axis]
        sh = NamedSharding(mesh, P(axis))
        return {
            name: jax.device_put(
                jnp.zeros((-(-c.num_categories // n) * n,), jnp.float32), sh
            )
            for name, c in self.configs.items()
        }

    def apply_sharded(
        self,
        tables: Dict[str, jax.Array],
        indices: Dict[str, jax.Array],
        weights: Optional[Dict[str, jax.Array]] = None,
        offsets: Optional[Dict[str, jax.Array]] = None,
        *,
        mesh,
        axis: str = "model",
    ) -> Dict[str, jax.Array]:
        """All-to-all routed pooled lookup for every table in ``indices``.

        Tables from :meth:`shard`; batch data-sharded ``P(axis, None)``
        on the same axis (sharded-CSR blocks with ``offsets`` — see
        :func:`cuembed_tpu.parallel.sharding.shard_csr`).
        """
        from cuembed_tpu.parallel import alltoall_row_sharded_lookup

        out = {}
        for name, idx in indices.items():
            c = self.configs[name]
            out[name] = alltoall_row_sharded_lookup(
                tables[name], idx,
                weights.get(name) if weights else None,
                offsets.get(name) if offsets else None,
                mesh=mesh, mode=c.mode, axis=axis,
            )
        return out

    def sgd_update_sharded(
        self,
        tables: Dict[str, jax.Array],
        indices: Dict[str, jax.Array],
        grads_y: Dict[str, jax.Array],
        *,
        mesh,
        lr: float,
        weights: Optional[Dict[str, jax.Array]] = None,
        offsets: Optional[Dict[str, jax.Array]] = None,
        axis: str = "model",
    ) -> Dict[str, jax.Array]:
        """Routed sparse SGD for every table in ``grads_y``."""
        from cuembed_tpu.parallel import sharded_sgd_sparse_update

        new = dict(tables)
        for name, gy in grads_y.items():
            c = self.configs[name]
            new[name] = sharded_sgd_sparse_update(
                tables[name], indices[name], gy, mesh=mesh, lr=lr,
                offsets=offsets.get(name) if offsets else None,
                weights=weights.get(name) if weights else None,
                mode=c.mode, axis=axis,
            )
        return new

    def adagrad_update_sharded(
        self,
        tables: Dict[str, jax.Array],
        accums: Dict[str, jax.Array],
        indices: Dict[str, jax.Array],
        grads_y: Dict[str, jax.Array],
        *,
        mesh,
        lr: float,
        eps: float = 1e-8,
        weights: Optional[Dict[str, jax.Array]] = None,
        offsets: Optional[Dict[str, jax.Array]] = None,
        axis: str = "model",
    ) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
        """Routed row-wise AdaGrad for every table in ``grads_y``."""
        from cuembed_tpu.parallel import (
            sharded_rowwise_adagrad_sparse_update,
        )

        new_t, new_a = dict(tables), dict(accums)
        for name, gy in grads_y.items():
            c = self.configs[name]
            new_t[name], new_a[name] = (
                sharded_rowwise_adagrad_sparse_update(
                    tables[name], accums[name], indices[name], gy,
                    mesh=mesh, lr=lr, eps=eps,
                    offsets=offsets.get(name) if offsets else None,
                    weights=weights.get(name) if weights else None,
                    mode=c.mode, axis=axis,
                )
            )
        return new_t, new_a

    def adagrad_update(
        self,
        tables: Dict[str, jax.Array],
        accums: Dict[str, jax.Array],
        indices: Dict[str, jax.Array],
        grads_y: Dict[str, jax.Array],
        *,
        lr: float,
        eps: float = 1e-8,
        weights: Optional[Dict[str, jax.Array]] = None,
        offsets: Optional[Dict[str, jax.Array]] = None,
        tiered: bool = False,
    ) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
        new_t, new_a = dict(tables), dict(accums)
        for name, gy in grads_y.items():
            c = self.configs[name]
            new_t[name], new_a[name] = rowwise_adagrad_sparse_update(
                tables[name],
                accums[name],
                indices[name],
                gy,
                lr=lr,
                eps=eps,
                offsets=offsets.get(name) if offsets else None,
                weights=weights.get(name) if weights else None,
                mode=c.mode,
                tiered_cfg=self.tiered[name] if tiered else None,
            )
        return new_t, new_a
