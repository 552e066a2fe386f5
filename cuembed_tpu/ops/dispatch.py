"""Backend dispatch: Pallas kernels vs the XLA-composed path.

The analog of the reference's launch heuristics
(``embedding_lookup.cuh:160-208`` picks load widths and CTA shapes): here
the decision is *which lowering to use* — the hand-written Pallas
gather-reduce kernel (TPU only, shape-constrained) or the XLA-composed
gather + segment-sum. Block-shape selection for the Pallas kernels lives
with the kernels themselves (:mod:`cuembed_tpu.ops.pallas_forward`).
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp

from cuembed_tpu.ops import lookup_xla
from cuembed_tpu.ops.tiered import (
    TieredConfig,
    auto_config,
    tiered_forward,
    tiering_profitable,
)
from cuembed_tpu.types import CombineMode

# One-time hint when auto-dispatch serves a >VMEM-budget table through the
# plain gather (2.6x off the tiered engine at flagship scale) because no
# tiered_cfg was supplied. Keyed by table shape so distinct tables each get
# one hint; cleared only by tests.
_slow_path_hinted: set = set()

# Lane width of the TPU vector unit; Pallas kernels require the embedding
# width padded to a multiple of this.
LANES = 128

# Auto-dispatch packs a raw narrow table inline only below this physical
# size (lane-padded bytes): an 8 MB relayout costs ~25 us — noise next to
# any lookup — while a 10M x 32 table costs ~20 ms per call (the round-2
# sweep defect). Larger tables need caller-owned packed storage. This is
# the v5e fallback; the active bound comes from the chip's measured
# record (cuembed_tpu.utils.chip.chip_constants()).
NARROW_INLINE_PACK_BYTES = 8 * 1024 * 1024


def _narrow_inline_pack_bytes() -> int:
    from cuembed_tpu.utils.chip import chip_constants

    return chip_constants()["narrow_inline_pack_bytes"]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def _call_profitable(indices, offsets) -> bool:
    """Batch-shape side of the tiering decision (tiered.tiering_profitable).

    Fixed-hotness reads the shape directly; CSR uses the static value
    capacity and its implied average hotness (an upper bound — padded
    batches overestimate, which only risks tiering a call the gate would
    otherwise skip, never skipping a profitable one).
    """
    if offsets is None:
        batch, hotness = indices.shape
        return tiering_profitable(batch * hotness, hotness)
    nnz = indices.shape[0]
    batch = max(1, offsets.shape[0] - 1)
    return tiering_profitable(nnz, nnz / batch)


def pallas_forward_supported(table, indices, offsets, weights, mode) -> bool:
    """Whether the Pallas forward kernel covers this call."""
    if mode == CombineMode.CONCAT:
        # Concat is a pure gather; XLA's gather lowering handles it well.
        return False
    if table.shape[1] % LANES != 0:
        return False
    if table.dtype not in (jnp.float32, jnp.bfloat16):
        # fp16 is rejected by the Mosaic dialect itself on current TPUs
        # ("Unsupported type in mosaic dialect: 'f16'", measured on
        # v5e); fp16 tables take the XLA path (identical semantics).
        return False
    return True


def tiered_auto_config(
    table, indices, offsets, mode
) -> Optional[TieredConfig]:
    """Auto tiered config for this call, or None when tiering doesn't apply.

    Tiering wins when the table exceeds what XLA serves from VMEM
    (~90 MB measured on v5e) and loses otherwise; CONCAT is a pure gather
    that tiering cannot accelerate.
    """
    if mode == CombineMode.CONCAT:
        return None
    if offsets is None:
        hotness = indices.shape[1]
    else:
        # CSR: estimate average hotness from the value capacity. This is
        # an UPPER bound (capacity includes padding): a heavily padded
        # batch inflates the estimate and mis-sizes the chunking. The
        # static config cannot read the traced ``offsets[-1]``, so the
        # precise number belongs at calibration time —
        # ``EmbeddingTable.refresh_layout(calibration_offsets=...)``
        # derives it from real offsets and passes an explicit cfg here.
        hotness = max(1, indices.shape[0] // max(1, offsets.shape[0] - 1))
    return auto_config(
        table.shape[0], table.shape[1], table.dtype.itemsize, hotness
    )


def forward(
    table: jax.Array,
    indices: jax.Array,
    offsets: Optional[jax.Array],
    weights: Optional[jax.Array],
    *,
    mode: CombineMode,
    low_precision_math: bool = False,
    backend: str = "auto",
    tiered_cfg: Optional[TieredConfig] = None,
) -> jax.Array:
    """Route a forward lookup to the best available implementation.

    The tiered path requires the table to be stored frequency-ordered
    (hot categories in the lowest rows — :mod:`cuembed_tpu.utils.frequency`),
    which the dispatcher cannot verify; it therefore only engages when
    the caller opts in, either with ``backend="tiered"`` or by passing an
    explicit ``tiered_cfg`` under ``backend="auto"``.
    """
    if backend not in ("auto", "pallas", "xla", "tiered", "narrow"):
        raise ValueError(f"unknown backend: {backend}")
    # Narrow tables (width < 128 lanes) waste 1 - W/128 of every fetched
    # tile line; the line-packed layout gathers at full rate (~2.9x
    # measured at width 32 — ops/narrow.py). Packing is a *relayout* of
    # the whole physical table (TPU arrays are lane-padded, so [V, 32]
    # occupies V x 128 lanes — ~20 ms for a 10M-row table), so it must
    # never sit in a per-call path for big tables: auto-dispatch packs
    # inline only when the relayout is microseconds-cheap, and otherwise
    # serves the raw layout with the plain gather. Callers that want the
    # fast path on big narrow tables own packed storage
    # (EmbeddingBag(layout="packed") / EmbeddingTable, or pack_narrow +
    # narrow_lookup directly); backend="narrow" forces the per-call
    # repack for one-off calls that accept its cost.
    from cuembed_tpu.ops import narrow as narrow_mod

    w = table.shape[1]
    if w < LANES and narrow_mod.packing_factor(w) > 1:
        phys_bytes = table.shape[0] * LANES * table.dtype.itemsize
        if backend == "narrow" or (
            backend in ("auto", "tiered")
            and phys_bytes <= _narrow_inline_pack_bytes()
        ):
            cfg_n = tiered_cfg
            if backend == "tiered" and cfg_n is None:
                cfg_n = tiered_auto_config(table, indices, offsets, mode)
            # auto = fastest: the packed gather beats line-tiering outside
            # the measured profitable region (tiered.tiering_profitable).
            if (
                backend == "auto"
                and cfg_n is not None
                and not _call_profitable(indices, offsets)
            ):
                cfg_n = None
            packed = narrow_mod.pack_narrow(table)
            return narrow_mod.narrow_lookup(
                packed, table.shape[0], w, indices, weights, offsets,
                mode=mode, low_precision_math=low_precision_math,
                tiered_cfg=cfg_n,
            )
        if backend == "tiered":
            raise ValueError(
                "backend='tiered' on a raw narrow table would repack it "
                "every call; store it line-packed (pack_narrow) and call "
                "narrow_lookup(..., tiered_cfg=...) or use "
                "EmbeddingTable/EmbeddingBag(layout='packed')"
            )
        # auto + big raw narrow table: fall through to the plain gather.
        tiered_cfg = None
    elif backend == "narrow":
        raise ValueError(
            "backend='narrow' needs width < 128 with 128 % width == 0"
        )
    if backend == "tiered" or (
        backend == "auto"
        and tiered_cfg is not None
        and _on_tpu()
        and mode != CombineMode.CONCAT
        # auto = fastest: outside the measured profitable batch-shape
        # region the plain gather wins (up to 9x at hotness 1) — the
        # calibrated layout stays valid, the call just routes around the
        # chunk machinery. backend="tiered" remains an explicit override.
        and _call_profitable(indices, offsets)
    ):
        cfg = tiered_cfg or tiered_auto_config(table, indices, offsets, mode)
        if cfg is not None:
            return tiered_forward(
                table,
                indices,
                offsets,
                weights,
                mode=mode,
                cfg=cfg,
                low_precision_math=low_precision_math,
            )
        if backend == "tiered":
            if mode == CombineMode.CONCAT:
                raise ValueError(
                    "CONCAT is a pure gather and is never tiered; use "
                    "backend='auto' or 'xla'"
                )
            raise ValueError(
                "backend='tiered' but the table fits the VMEM budget; "
                "use backend='auto' (the plain gather is already fast)"
            )
    if (
        backend == "auto"
        and tiered_cfg is None
        and _on_tpu()
        and mode != CombineMode.CONCAT
    ):
        key = (table.shape, str(table.dtype))
        if key not in _slow_path_hinted and (
            tiered_auto_config(table, indices, offsets, mode) is not None
        ):
            _slow_path_hinted.add(key)
            mb = table.shape[0] * table.shape[1] * table.dtype.itemsize / 2**20
            warnings.warn(
                f"embedding_lookup is serving a {mb:.0f} MB table through "
                "the plain XLA gather — ~2.6x slower than the tiered "
                "engine at this scale (docs/PERF_NOTES.md). Fast path: "
                "wrap the table once in cuembed_tpu.EmbeddingTable and "
                "call calibrate(batch) (or refresh_layout()); if your ids "
                "are already assigned hot-first, "
                "EmbeddingTable(t).use_natural_order() skips the "
                "calibration ceremony entirely.",
                stacklevel=3,
            )
    # The Pallas forward is kept as an explicit opt-in: its scalar-core
    # DMA issue rate (~34 M rows/s measured on v5e) loses to XLA's own
    # gather emitter (~80 M rows/s from HBM, ~300 M rows/s from VMEM) —
    # see docs/PERF_NOTES.md. "auto" therefore routes to the XLA path
    # unless a tiered config applies (handled above).
    use_pallas = backend == "pallas"
    if use_pallas and not pallas_forward_supported(
        table, indices, offsets, weights, mode
    ):
        raise ValueError(
            "backend='pallas' does not cover this call (CONCAT, "
            "width % 128 != 0, or unsupported dtype); use backend='xla' "
            "or 'auto'"
        )
    if use_pallas:
        from cuembed_tpu.ops import pallas_forward

        return pallas_forward.embedding_forward_pallas(
            table,
            indices,
            offsets,
            weights,
            mode=mode,
            low_precision_math=low_precision_math,
        )
    return lookup_xla.embedding_forward_xla(
        table,
        indices,
        offsets,
        weights,
        mode=mode,
        low_precision_math=low_precision_math,
    )


def backward(
    grad_y: jax.Array,
    num_categories: int,
    transpose_indices: jax.Array,
    transpose_sample_ids: jax.Array,
    transpose_weights: Optional[jax.Array],
    *,
    nnz: Optional[jax.Array] = None,
    backend: str = "auto",
    live_cap: Optional[int] = None,
) -> jax.Array:
    """Route the COO backward to the best available implementation.

    The Pallas run-grouped kernel is explicit-opt-in only: its per-row
    DMA issue rate (~30 ns on the scalar core) loses to XLA's sorted
    scatter-add (~90 M rows/s measured) — see ops/pallas_backward.py.
    """
    if backend == "pallas":
        from cuembed_tpu.ops import pallas_backward

        if pallas_backward.supported(grad_y, num_categories):
            return pallas_backward.embedding_backward_pallas(
                grad_y,
                num_categories,
                transpose_indices,
                transpose_sample_ids,
                transpose_weights,
                nnz=nnz,
            )
    return lookup_xla.embedding_backward_xla(
        grad_y,
        num_categories,
        transpose_indices,
        transpose_sample_ids,
        transpose_weights,
        nnz=nnz,
        live_cap=live_cap,
    )
