"""The user-facing differentiable embedding-lookup API.

This layer plays the role of the reference's PyTorch extension
(``examples/pytorch/cuembed_embedding.cu:169-190`` +
``cuembed_pyt.py:37-51``): a framework-integrated, autodiff-ready lookup
whose backward chains row-id extraction → transpose → COO backward.

Here that chain is a ``jax.custom_vjp``:

* forward saves only ``(table, indices, offsets, weights)`` — no activation
  the size of the output is retained,
* backward sorts the COO by index (``lax.sort``) and segment-sums runs —
  deterministic, no atomics (stronger than the reference, whose framework
  test needs ``allclose`` because of atomics, ``cuembed_test.py:33``),
* gradients flow to the table and (beyond the reference) to the per-lookup
  weights; indices/offsets are non-differentiable.

Compute is routed through :mod:`cuembed_tpu.ops.dispatch`, which picks the
Pallas kernel or the XLA-composed path per shape/platform.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from cuembed_tpu.ops import dispatch
from cuembed_tpu.ops.head import tiered_backward_coo
from cuembed_tpu.ops.tiered import TieredConfig
from cuembed_tpu.ops.transforms import (
    extract_row_ids_from_csr,
    transpose,
    transpose_masked_compact,
)
from cuembed_tpu.types import (
    CombineMode,
    accumulation_dtype,
    canonical_index_dtype,
)


@dataclass(frozen=True)
class _LookupConfig:
    """Hashable static configuration threaded through the custom_vjp."""

    mode: CombineMode
    low_precision_math: bool
    backend: str  # "auto" | "pallas" | "xla" | "tiered"
    tiered_cfg: Optional[TieredConfig] = None


def embedding_lookup(
    table: jax.Array,
    indices: jax.Array,
    weights: Optional[jax.Array] = None,
    *,
    mode: CombineMode = CombineMode.SUM,
    low_precision_math: bool = False,
    backend: str = "auto",
    tiered_cfg: Optional[TieredConfig] = None,
    remap: Optional[jax.Array] = None,
) -> jax.Array:
    """Differentiable fixed-hotness embedding lookup.

    Args:
      table: ``[num_categories, width]`` embedding table.
      indices: ``[batch, hotness]`` int32/int64 lookup indices.
      weights: optional ``[batch, hotness]`` weights (SUM only).
      mode: SUM / MEAN / CONCAT.
      low_precision_math: accumulate half tables in half precision
        (the reference's ``fp16_math=true``).
      backend: "auto" (shape-based dispatch), "pallas", "xla", or
        "tiered" (hot/cold split for HBM-resident tables; see
        :mod:`cuembed_tpu.ops.tiered`).
      tiered_cfg: explicit tiered configuration (None => auto-sized).
      remap: optional ``[num_categories]`` int32 category->row translation
        (frequency ordering, :mod:`cuembed_tpu.utils.frequency`); applied
        to ``indices`` before the lookup.

    Returns:
      ``[batch, width]`` (SUM/MEAN) or ``[batch * hotness, width]`` (CONCAT).
    """
    indices = _canonicalize_indices(indices, table.shape[0])
    if remap is not None:
        indices = jnp.take(remap, indices, axis=0)
    _validate(table, indices, None, weights, mode)
    cfg = _LookupConfig(mode, low_precision_math, backend, tiered_cfg)
    return _lookup(cfg, table, indices, None, weights)


def embedding_lookup_csr(
    table: jax.Array,
    indices: jax.Array,
    offsets: jax.Array,
    weights: Optional[jax.Array] = None,
    *,
    mode: CombineMode = CombineMode.SUM,
    low_precision_math: bool = False,
    backend: str = "auto",
    tiered_cfg: Optional[TieredConfig] = None,
    remap: Optional[jax.Array] = None,
) -> jax.Array:
    """Differentiable CSR (variable-hotness) embedding lookup.

    ``indices`` is the flat value array (static capacity; entries at or
    beyond ``offsets[-1]`` are padding and ignored), ``offsets`` is
    ``[batch + 1]``. CONCAT is not supported with CSR (reference
    ``embedding_lookup.cuh:261-267``). ``remap`` as in
    :func:`embedding_lookup`.
    """
    indices = _canonicalize_indices(indices, table.shape[0])
    if remap is not None:
        indices = jnp.take(remap, indices, axis=0)
    _validate(table, indices, offsets, weights, mode)
    cfg = _LookupConfig(mode, low_precision_math, backend, tiered_cfg)
    return _lookup(cfg, table, indices, offsets, weights)


def _canonicalize_indices(indices, num_categories):
    """Accept int32/int64 indices; run int64 through int32 when lossless.

    The reference instantiates the full int64 surface
    (``embedding_gpu_forward.cu:61-77``); TPUs are 32-bit-native, so int64
    is narrowed whenever ``num_categories < 2**31`` (always, in practice).
    """
    target = canonical_index_dtype(
        getattr(indices, "dtype", jnp.int32), num_categories
    )
    indices = jnp.asarray(indices)
    return indices if indices.dtype == target else indices.astype(target)


def _validate(table, indices, offsets, weights, mode):
    if weights is not None and mode != CombineMode.SUM:
        raise ValueError("weights are only supported with CombineMode.SUM")
    if offsets is not None:
        if mode == CombineMode.CONCAT:
            raise ValueError("CSR does not support CONCAT")
        if indices.ndim != 1:
            raise ValueError("CSR indices must be flat [capacity]")
    else:
        if indices.ndim != 2:
            raise ValueError("fixed-hotness indices must be [batch, hotness]")
    if table.ndim != 2:
        raise ValueError("table must be [num_categories, width]")


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lookup(cfg, table, indices, offsets, weights):
    return dispatch.forward(
        table,
        indices,
        offsets,
        weights,
        mode=cfg.mode,
        low_precision_math=cfg.low_precision_math,
        backend=cfg.backend,
        tiered_cfg=cfg.tiered_cfg,
    )


def _lookup_fwd(cfg, table, indices, offsets, weights):
    out = _lookup(cfg, table, indices, offsets, weights)
    return out, (table, indices, offsets, weights)


def _lookup_bwd(cfg, residuals, grad_y):
    table, indices, offsets, weights = residuals
    num_categories, width = table.shape
    if num_categories >= 2**31:
        # The COO machinery below (flatten, sentinel, sort keys) is
        # int32 throughout; silently narrowing genuine int64 row ids
        # would wrap them negative and corrupt the gradient. Such a
        # table cannot fit a real chip's HBM at any supported width
        # (the documented int64 deviation, README) — fail loudly.
        raise NotImplementedError(
            "backward for tables with >= 2**31 rows is unsupported: "
            "the sparse COO path is int32; use forward-only lookups"
        )
    acc_dt = accumulation_dtype(table.dtype, cfg.low_precision_math)

    # --- Flatten to COO: (flat_idx, sample_ids, coeff) -------------------
    if offsets is None:
        batch, hotness = indices.shape
        nnz_cap = batch * hotness
        flat_idx = indices.reshape(-1).astype(jnp.int32)
        pos = jnp.arange(nnz_cap, dtype=jnp.int32)
        if cfg.mode == CombineMode.CONCAT:
            sample_ids = pos  # grad_y row per nonzero
            grad_rows_in = grad_y.reshape(nnz_cap, width)
        else:
            sample_ids = pos // hotness
            grad_rows_in = grad_y
        nnz = None  # no padding in fixed-hotness layout
        live = None
    else:
        batch = offsets.shape[0] - 1
        nnz_cap = indices.shape[0]
        pos = jnp.arange(nnz_cap, dtype=jnp.int32)
        live = pos < offsets[-1]
        # Padded entries get an out-of-range sentinel so they sort last.
        flat_idx = jnp.where(
            live, indices.astype(jnp.int32), jnp.iinfo(jnp.int32).max
        )
        sample_ids = extract_row_ids_from_csr(offsets, indices).astype(jnp.int32)
        grad_rows_in = grad_y
        nnz = offsets[-1]

    # Per-position combine coefficient (weight / 1 / 1/hotness). For
    # unweighted fixed-hotness lookups the coefficient is one constant,
    # which folds into grad_y as a single [batch, W] scale — the COO
    # then carries NO coefficient operand, saving a full [nnz, W]
    # multiply pass in the backward (measured ~8 ms at flagship scale).
    if weights is None and offsets is None:
        coeff = None
        if cfg.mode == CombineMode.MEAN:
            grad_rows_in = grad_rows_in * (1.0 / indices.shape[1])
    else:
        coeff = jnp.ones((nnz_cap,), acc_dt)
        if weights is not None:
            coeff = coeff * weights.reshape(-1).astype(acc_dt)
        if cfg.mode == CombineMode.MEAN:
            hot = (offsets[1:] - offsets[:-1]).astype(acc_dt)
            inv_hot = jnp.where(hot == 0, 0.0, 1.0 / jnp.maximum(hot, 1.0))
            coeff = coeff * jnp.take(inv_hot, sample_ids)
        if live is not None:
            coeff = coeff * live.astype(acc_dt)

    # --- Tiered backward (fixed-hotness with a tiered config) ------------
    # The MXU head absorbs the scatter-hottest rows exactly
    # (grad[:HEAD] = M^T @ grad_y), and the remaining positions sort to a
    # static capacity so the scatter-add issues ~(1 - head_fraction) * nnz
    # descriptors instead of nnz. Overflow falls back to the full-width
    # scatter via lax.cond.
    tiered = cfg.tiered_cfg
    head_rows = (
        tiered.mxu_head_rows
        if (
            tiered is not None
            and offsets is None
            and cfg.mode != CombineMode.CONCAT
        )
        else 0
    )
    if head_rows > 0:
        gy = grad_rows_in.astype(acc_dt)
        sentinel = jnp.iinfo(jnp.int32).max
        rest_idx = jnp.where(flat_idx < head_rows, sentinel, flat_idx)
        # Compacted masked transpose: only the calibrated non-head
        # fraction rides the global sort (measured 1.31x at the
        # flagship, PERF_NOTES §masked-transpose; lax.cond falls back
        # to the full sort on overflow).
        t_idx, t_sid, t_coeff = transpose_masked_compact(
            sample_ids, rest_idx, coeff,
            chunk_elems=tiered.chunk_elems,
            nonhead_slots=tiered.mid_slots + tiered.cold_slots,
        )
        coeff2d = None if coeff is None else coeff.reshape(indices.shape)
        grad_table = tiered_backward_coo(
            gy, num_categories, indices, coeff2d,
            t_idx, t_sid, t_coeff, tiered, backend=cfg.backend,
        ).astype(table.dtype)
    else:
        # --- Transpose (sort by index) + deterministic segment backward --
        t_idx, t_sid, t_coeff = transpose(sample_ids, flat_idx, coeff)
        # CSR: sentinels sort last, so a calibrated live capacity
        # (cfg.tiered_cfg.csr_live_cap) bounds the descriptor-bound
        # gather/scatter at the live prefix (lax.cond fallback inside).
        live_cap = (
            tiered.csr_live_cap
            if (tiered is not None and offsets is not None
                and tiered.csr_live_cap > 0)
            else None
        )
        grad_table = dispatch.backward(
            grad_rows_in.astype(acc_dt),
            num_categories,
            t_idx,
            t_sid,
            t_coeff,
            nnz=nnz,
            backend=cfg.backend,
            live_cap=live_cap,
        ).astype(table.dtype)

    # --- Gradient w.r.t. weights (extension beyond the reference) --------
    grad_weights = None
    if weights is not None:
        rows = jnp.take(table, flat_idx.clip(0, num_categories - 1), axis=0)
        g = jnp.take(grad_rows_in, sample_ids, axis=0)
        dw = jnp.sum(rows.astype(acc_dt) * g.astype(acc_dt), axis=-1)
        if live is not None:
            dw = dw * live.astype(acc_dt)
        grad_weights = dw.reshape(weights.shape).astype(weights.dtype)

    return grad_table, None, None, grad_weights


_lookup.defvjp(_lookup_fwd, _lookup_bwd)
