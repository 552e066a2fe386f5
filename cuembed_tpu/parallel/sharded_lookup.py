"""Sharded embedding lookup over a device mesh (shard_map + collectives).

This is the layer the reference lists as future work (``README.md:110``),
designed TPU-first rather than as an NCCL translation:

* **Row sharding** (default): each model shard owns a contiguous row range
  of the table. Lookup indices are replicated across the model axis (they
  are already sharded over the data axis); each shard gathers only the
  rows it owns (masked local Pallas/XLA lookup — zero coefficient for
  foreign rows), and the pooled partials are summed with one ``psum`` over
  ICI. Each table row is read exactly once, where it lives; the only
  communication is ``[local_batch, width]`` per shard.

* **Column sharding**: each shard holds a ``width / n`` column slice of
  every row; lookups are fully local and the output stays feature-sharded
  (a trailing ``all_gather`` is the caller's choice).

Both compose with ``jax.grad``: the inner lookup is the framework's
``custom_vjp``, and ``psum``/masking transpose correctly, so table
gradients land on the owning shard only.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from cuembed_tpu.ops.api import embedding_lookup, embedding_lookup_csr
from cuembed_tpu.ops.transforms import extract_row_ids_from_csr
from cuembed_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS
from cuembed_tpu.types import CombineMode

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def row_sharded_lookup(
    table: jax.Array,
    indices: jax.Array,
    weights: Optional[jax.Array] = None,
    offsets: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    mode: CombineMode = CombineMode.SUM,
    backend: str = "auto",
    tiered_cfg=None,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
) -> jax.Array:
    """Lookup against a row-sharded table.

    Args:
      table: ``[num_categories, width]``; rows must divide evenly by the
        model-axis size (see :func:`pad_table_for_shards`). Sharded
        ``P(model, None)``.
      indices: ``[batch, hotness]`` (or flat CSR with ``offsets``), sharded
        ``P(data, ...)``.
      weights/offsets/mode: as in :func:`embedding_lookup`.
      tiered_cfg: optional :class:`cuembed_tpu.ops.tiered.TieredConfig`
        for the LOCAL shard lookup, in local-slice row units
        (``hot_rows <= num_categories / n_model``). Any contiguous slice
        of a frequency-ordered table is itself frequency-ordered, so a
        globally reordered + remapped table makes every local slice
        tiered-servable with one shared config; foreign-row positions
        enter the local engine as index 0 with coefficient 0 — inert MXU
        head traffic that consumes no mid/cold slots. Size the static
        capacities for the most skewed shard (calibrate per shard and
        take maxima).

    Returns:
      Pooled output ``[batch, width]`` (or ``[batch*hotness, width]`` for
      CONCAT), sharded ``P(data, None)``.
    """
    if mode == CombineMode.CONCAT:
        if weights is not None:
            raise ValueError("weights are only supported with CombineMode.SUM")
        if offsets is not None:
            raise ValueError("CSR does not support CONCAT")
    n_model = mesh.shape[model_axis]
    num_rows = table.shape[0]
    if num_rows % n_model != 0:
        raise ValueError("pad table rows to a multiple of the model axis")
    rows_per = num_rows // n_model

    # CSR's flat nnz layout cannot be split along the data axis without
    # re-basing sample boundaries; the *sharded-CSR* layout
    # (2D [n_data, cap] blocks from parallel.sharding.shard_csr) shards
    # over data like fixed-hotness batches. Flat (1D) CSR inputs fall
    # back to replication across data.
    sharded_csr = offsets is not None and offsets.ndim == 2
    if offsets is not None and not sharded_csr:
        idx_spec = P(None)
        out_spec = P(None, None)
        off_spec = P(None)
    elif sharded_csr:
        idx_spec = P(data_axis, None)
        out_spec = P(data_axis, None, None)
        off_spec = P(data_axis, None)
    else:
        idx_spec = P(data_axis, None)
        out_spec = P(data_axis, None)
    in_specs = [P(model_axis, None), idx_spec]
    args = [table, indices]
    if weights is not None:
        in_specs.append(idx_spec)
        args.append(weights)
    if offsets is not None:
        in_specs.append(off_spec)
        args.append(offsets)

    def local(table_l, idx_l, *rest):
        rest = list(rest)
        w_l = rest.pop(0) if weights is not None else None
        offs_l = rest.pop(0) if offsets is not None else None
        if sharded_csr:
            # one [1, cap] block per shard -> flat local CSR problem
            idx_l = idx_l.reshape(-1)
            offs_l = offs_l.reshape(-1)
            if w_l is not None:
                w_l = w_l.reshape(-1)
        shard = jax.lax.axis_index(model_axis)
        lo = (shard * rows_per).astype(idx_l.dtype)
        owned = (idx_l >= lo) & (idx_l < lo + rows_per)
        local_idx = jnp.where(owned, idx_l - lo, 0)

        if mode == CombineMode.CONCAT:
            rows = embedding_lookup(
                table_l, local_idx, mode=CombineMode.CONCAT, backend=backend
            )
            mask = owned.reshape(-1, 1).astype(rows.dtype)
            partial_out = rows * mask
        else:
            coeff = owned.astype(jnp.float32)
            if w_l is not None:
                coeff = coeff * w_l.astype(jnp.float32)
            if mode == CombineMode.MEAN:
                if offs_l is None:
                    coeff = coeff / idx_l.shape[-1]
                else:
                    counts = (offs_l[1:] - offs_l[:-1]).astype(jnp.float32)
                    inv = jnp.where(counts == 0, 0.0, 1.0 / jnp.maximum(counts, 1.0))
                    sample = extract_row_ids_from_csr(offs_l, idx_l)
                    coeff = coeff * jnp.take(inv, sample)
            eff_backend = backend
            if tiered_cfg is not None and backend == "auto":
                # an explicit local config opts the shard lookup into
                # the tiered engine (same rule as single-chip dispatch)
                eff_backend = "tiered"
            if offs_l is not None:
                partial_out = embedding_lookup_csr(
                    table_l,
                    local_idx,
                    offs_l,
                    coeff,
                    mode=CombineMode.SUM,
                    backend=eff_backend,
                    tiered_cfg=tiered_cfg,
                )
            else:
                partial_out = embedding_lookup(
                    table_l,
                    local_idx,
                    coeff,
                    mode=CombineMode.SUM,
                    backend=eff_backend,
                    tiered_cfg=tiered_cfg,
                )
        out = jax.lax.psum(partial_out, model_axis)
        return out[None] if sharded_csr else out

    return shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_spec,
        check_vma=False,
    )(*args)


def column_sharded_lookup(
    table: jax.Array,
    indices: jax.Array,
    weights: Optional[jax.Array] = None,
    offsets: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    mode: CombineMode = CombineMode.SUM,
    backend: str = "auto",
    gather_output: bool = True,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
) -> jax.Array:
    """Lookup against a column-sharded table (``P(None, model)``).

    Every shard performs the full lookup on its width slice; output is
    feature-sharded ``P(data, model)``, optionally all-gathered back to
    ``P(data, None)``.
    """
    if offsets is not None:
        idx_spec = P(None)
        batch_spec = None  # replicated batch (see row_sharded_lookup note)
    else:
        idx_spec = P(data_axis, None)
        batch_spec = data_axis
    in_specs = [P(None, model_axis), idx_spec]
    args = [table, indices]
    if weights is not None:
        in_specs.append(idx_spec)
        args.append(weights)
    if offsets is not None:
        in_specs.append(P(None))
        args.append(offsets)
    out_spec = (
        P(batch_spec, None) if gather_output else P(batch_spec, model_axis)
    )

    def local(table_l, idx_l, *rest):
        rest = list(rest)
        w_l = rest.pop(0) if weights is not None else None
        offs_l = rest.pop(0) if offsets is not None else None
        if offs_l is not None:
            out = embedding_lookup_csr(
                table_l, idx_l, offs_l, w_l, mode=mode, backend=backend
            )
        else:
            out = embedding_lookup(table_l, idx_l, w_l, mode=mode, backend=backend)
        if gather_output:
            out = jax.lax.all_gather(out, model_axis, axis=1, tiled=True)
        return out

    return shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_spec,
        check_vma=False,
    )(*args)
