"""EmbeddingTable: a stateful single-table wrapper that is fast by default.

The tiered engine (:mod:`cuembed_tpu.ops.tiered`) needs three pieces of
ceremony before it can engage: frequency statistics, a frequency-ordered
table layout, and the id->row remap applied to incoming indices. The
reference's API is fast without ceremony (the GPU L2 needs no setup), so
this wrapper owns all three — the single-table analog of
``EmbeddingCollection.reorder`` (:mod:`cuembed_tpu.collection`):

    t = EmbeddingTable.create(key, num_categories=10_000_000, width=256,
                              dtype=jnp.bfloat16)
    t.observe(calibration_indices)      # host-side frequency counting
    t.refresh_layout()                  # reorder + remap + capacities
    out = t.lookup(indices)             # tiered-fast, correct either way

``lookup`` works before any calibration too (plain XLA path, correct);
after ``refresh_layout`` it automatically routes through the tiered
engine with the calibrated config.

Index remapping placement (measured, docs/PERF_NOTES.md): a device-side
remap gather costs ~1.9 ms per 262K indices — comparable to an entire
tiered lookup — so production pipelines apply :meth:`remap_indices` on
the host while the device computes the previous batch (the
``utils.pipeline`` pattern). ``lookup`` accepts either form:
``assume_remapped=True`` for pipeline-remapped indices (fast path), else
it remaps on device (correct, slower; documented cost).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cuembed_tpu.ops.api import embedding_lookup, embedding_lookup_csr
from cuembed_tpu.ops.tiered import DEFAULT_HOT_BYTES, TieredConfig, auto_config
from cuembed_tpu.types import CombineMode
from cuembed_tpu.utils import frequency as freq


class EmbeddingTable:
    """One embedding table plus the state that makes lookups fast.

    Attributes:
      table: the device table in the *current storage layout* (frequency-
        ordered after :meth:`refresh_layout`; training updates apply to
        this array directly).
      remap: ``original_category -> storage_row`` (host numpy int32), or
        None before any reorder.
      tiered_cfg: the calibrated :class:`TieredConfig`, or None when the
        table is small enough to be VMEM-served (plain path is optimal).
    """

    def __init__(
        self,
        table: jax.Array,
        *,
        mode: CombineMode = CombineMode.SUM,
        hot_bytes: int = DEFAULT_HOT_BYTES,
        low_precision_math: bool = False,
        layout: str = "auto",
        vmem_table_bytes: int | None = None,
    ):
        """``layout``: "auto" line-packs narrow tables (width < 128 with
        128 % width == 0) at construction — the physical HBM footprint is
        unchanged (TPU arrays are lane-padded either way) while gathers
        run at the full 128-lane rate and the VMEM hot head holds
        ``128/width`` x more logical rows; "raw" keeps the table as
        given (``self.table`` is then ``[V, W]``); "packed" requires a
        packable width. ``table`` must always be the *logical* ``[V, W]``
        array — packing happens here.
        """
        if layout not in ("auto", "raw", "packed"):
            raise ValueError(f"unknown layout: {layout}")
        from cuembed_tpu.ops.narrow import pack_narrow, packing_factor

        self._num_categories, self._width = table.shape
        k = packing_factor(self._width)
        if layout == "packed" and k == 1:
            raise ValueError(
                "layout='packed' needs width < 128 with 128 % width == 0"
            )
        self._pack_k = k if layout in ("auto", "packed") else 1
        self.table = pack_narrow(table) if self._pack_k > 1 else table
        self.mode = mode
        self.hot_bytes = hot_bytes
        # Tables at or below this byte size skip tiering entirely (XLA
        # serves them from VMEM); override when porting to a chip with a
        # different VMEM budget, or to force tiering in tests.
        self.vmem_table_bytes = vmem_table_bytes
        self.low_precision_math = low_precision_math
        self.counts: Optional[np.ndarray] = None
        self.remap: Optional[np.ndarray] = None
        self._remap_dev: Optional[jax.Array] = None
        self.tiered_cfg: Optional[TieredConfig] = None
        self._natural_order = False
        self._q_head = None  # ops.quant.QuantizedHead (opt-in, lossy)
        self._q_cfg: Optional[TieredConfig] = None

    # -- construction ------------------------------------------------------
    @classmethod
    def create(
        cls,
        key: jax.Array,
        num_categories: int,
        width: int,
        *,
        dtype=jnp.float32,
        mode: CombineMode = CombineMode.SUM,
        hot_bytes: int = DEFAULT_HOT_BYTES,
        low_precision_math: bool = False,
        layout: str = "auto",
        vmem_table_bytes: int | None = None,
    ) -> "EmbeddingTable":
        scale = 1.0 / (width**0.5)
        table = jax.random.uniform(
            key, (num_categories, width), jnp.float32, -scale, scale
        ).astype(dtype)
        return cls(
            table, mode=mode, hot_bytes=hot_bytes,
            low_precision_math=low_precision_math, layout=layout,
            vmem_table_bytes=vmem_table_bytes,
        )

    @property
    def num_categories(self) -> int:
        return self._num_categories

    @property
    def width(self) -> int:
        return self._width

    def logical_table(self) -> jax.Array:
        """The ``[V, W]`` view of the storage (unpacks narrow layouts)."""
        if self._pack_k == 1:
            return self.table
        return self.table.reshape(-1, self._width)[: self._num_categories]

    # -- frequency statistics (host side) ----------------------------------
    def observe(self, indices) -> None:
        """Fold one batch of *original-id* indices into the running counts."""
        idx = np.asarray(indices)
        self.counts = freq.count_frequencies(
            idx, self.num_categories, self.counts
        )

    def decay(self, rate: float = 0.9) -> None:
        """Decay running counts (call between traffic windows)."""
        if self.counts is not None:
            self.counts = freq.decay_counts(self.counts, rate)

    # -- layout maintenance -------------------------------------------------
    def refresh_layout(
        self, calibration_indices=None, calibration_offsets=None
    ) -> None:
        """Reorder storage by observed frequency and calibrate the tiers.

        ``lookup`` results are unchanged (the remap composes with the
        reorder); only speed changes. ``calibration_indices`` (original
        ids, any shape ``[..., hotness]``) tightens the static capacities
        to observed per-chunk maxima; defaults to capacity formulas from
        the observed tier fractions. For CSR workloads pass
        ``calibration_offsets`` (one representative ``[batch+1]`` offsets
        array, with ``calibration_indices`` the matching flat values):
        the average hotness then comes from the live count
        ``offsets[-1]`` rather than the value-array capacity, which
        over-estimates it on padded batches and mis-sizes the chunking.
        """
        if self.counts is None:
            raise ValueError("observe() at least one batch first")
        perm, remap = freq.frequency_order(self.counts)
        # Compose with any existing layout: counts/observe always speak
        # original ids, so the new remap replaces (not stacks on) the old.
        storage_perm = perm if self.remap is None else self._compose_perm(perm)
        # Reorder on device (one row gather, ~80 M rows/s) — a host
        # round-trip of a multi-GB table would dwarf it. Packed layouts
        # reorder through the logical view and re-pack (both reshapes).
        if self._pack_k == 1:
            self.table = jax.block_until_ready(
                jnp.take(self.table, jnp.asarray(storage_perm), axis=0)
            )
        else:
            from cuembed_tpu.ops.narrow import pack_narrow

            self.table = jax.block_until_ready(
                pack_narrow(
                    jnp.take(
                        self.logical_table(), jnp.asarray(storage_perm),
                        axis=0,
                    )
                )
            )
        self.remap = remap
        self._remap_dev = None
        self._natural_order = False  # superseded by the measured reorder
        # The int8 head (if any) is a snapshot of the PREVIOUS physical
        # ordering; serving it against the new remap would return rows of
        # entirely different categories. Drop it — the existing
        # "enable_int8_head() first" check then fails loudly instead.
        self._q_head = None
        self._q_cfg = None

        hotness = 1
        if calibration_offsets is not None:
            off = np.asarray(calibration_offsets)
            batch = max(1, off.shape[0] - 1)
            hotness = max(1, int(round(float(off[-1]) / batch)))
        elif calibration_indices is not None:
            ci = np.asarray(calibration_indices)
            if ci.ndim >= 2:
                hotness = int(ci.shape[-1])
        ac_kw = dict(hot_bytes=self.hot_bytes)
        if self.vmem_table_bytes is not None:
            ac_kw["vmem_table_bytes"] = self.vmem_table_bytes
        cfg = auto_config(
            self.num_categories,
            self.width,
            jnp.dtype(self.table.dtype).itemsize,
            hotness,
            **ac_kw,
        )
        if cfg is not None and calibration_indices is not None:
            from cuembed_tpu.utils.calibration import refine_tiered_config

            ci = np.asarray(calibration_indices)
            if calibration_offsets is not None:
                # Only live CSR values inform capacities; padding would
                # skew the tier fractions toward whatever fills it.
                ci = ci.reshape(-1)[
                    : int(np.asarray(calibration_offsets)[-1])
                ]
            head_f, cold_f = freq.tier_fractions(
                ci, remap, cfg.mxu_head_rows, cfg.hot_rows, margin=1.15
            )
            cfg = auto_config(
                self.num_categories,
                self.width,
                jnp.dtype(self.table.dtype).itemsize,
                hotness,
                cold_fraction=cold_f,
                head_fraction=head_f,
                **ac_kw,
            )
            # One refinement pass sets slot capacities AND the backward
            # bounds (non-head fraction, MXU segment prefix); CSR
            # calibration additionally bounds the live prefix and the
            # per-chunk sample span (csr_live_cap / csr_chunk_samples).
            cfg = refine_tiered_config(
                cfg, remap[ci.reshape(1, -1)],
                calib_offsets=calibration_offsets,
                value_capacity=(
                    0 if calibration_offsets is None
                    else int(np.asarray(calibration_indices).size)
                ),
            )
        self.tiered_cfg = cfg

    def use_natural_order(
        self, calibration_indices=None, calibration_offsets=None,
        hotness: int = 1,
    ) -> None:
        """Zero-ceremony fast path: declare the id space ALREADY hot-first.

        Production logs commonly assign category ids by descending
        frequency (id 0 = most frequent). For such datasets the
        observe/reorder/remap ceremony is a no-op: this method skips it
        and calibrates the tiered config directly against the natural
        ordering — no permutation, no remap gather, no relayout.

        Correctness is unconditional (every backend returns the same
        values); only SPEED depends on the claim. If the ids are NOT
        frequency-ordered, the tiers misclassify and the engine degrades
        toward the plain-gather rate — use :meth:`calibrate` instead.

        ``calibration_indices`` (+ ``calibration_offsets`` for CSR), when
        given, tighten the static per-chunk capacities to observed maxima
        exactly as :meth:`refresh_layout` does; ``hotness`` seeds the
        chunking when no calibration batch is supplied.
        """
        if self.remap is not None:
            raise ValueError(
                "the table was already reordered (refresh_layout); "
                "natural order no longer holds for its storage layout"
            )
        if calibration_offsets is not None:
            off = np.asarray(calibration_offsets)
            batch = max(1, off.shape[0] - 1)
            hotness = max(1, int(round(float(off[-1]) / batch)))
        elif calibration_indices is not None:
            ci = np.asarray(calibration_indices)
            if ci.ndim >= 2:
                hotness = int(ci.shape[-1])
        ac_kw = dict(hot_bytes=self.hot_bytes)
        if self.vmem_table_bytes is not None:
            ac_kw["vmem_table_bytes"] = self.vmem_table_bytes
        cfg = auto_config(
            self.num_categories,
            self.width,
            jnp.dtype(self.table.dtype).itemsize,
            max(1, hotness),
            **ac_kw,
        )
        if cfg is not None and calibration_indices is not None:
            from cuembed_tpu.utils.calibration import refine_tiered_config

            ci = np.asarray(calibration_indices)
            if calibration_offsets is not None:
                ci = ci.reshape(-1)[
                    : int(np.asarray(calibration_offsets)[-1])
                ]
            identity = np.arange(self.num_categories, dtype=np.int32)
            head_f, cold_f = freq.tier_fractions(
                ci, identity, cfg.mxu_head_rows, cfg.hot_rows, margin=1.15
            )
            cfg = auto_config(
                self.num_categories,
                self.width,
                jnp.dtype(self.table.dtype).itemsize,
                max(1, hotness),
                cold_fraction=cold_f,
                head_fraction=head_f,
                **ac_kw,
            )
            cfg = refine_tiered_config(
                cfg, ci.reshape(1, -1),
                calib_offsets=calibration_offsets,
                value_capacity=(
                    0 if calibration_offsets is None
                    else int(np.asarray(calibration_indices).size)
                ),
            )
        self.tiered_cfg = cfg
        self._natural_order = True

    def _compose_perm(self, perm: np.ndarray) -> np.ndarray:
        """Permutation taking the *current* layout to the new one.

        Current storage row of original category c is ``old_remap[c]``;
        the new layout wants ``new_perm[r] = c`` at row r, i.e. current
        row ``old_remap[new_perm[r]]``.
        """
        return np.asarray(self.remap)[perm]

    def calibrate(self, calibration_indices, calibration_offsets=None) -> None:
        """One-call ceremony: observe + refresh_layout.

        For CSR pass the flat values plus ``calibration_offsets``; only
        the live prefix (``offsets[-1]``) informs counts and capacities.
        """
        obs = np.asarray(calibration_indices)
        if calibration_offsets is not None:
            obs = obs.reshape(-1)[
                : int(np.asarray(calibration_offsets)[-1])
            ]
        self.observe(obs)
        self.refresh_layout(calibration_indices, calibration_offsets)

    # -- opt-in int8 head (lossy serving mode) -------------------------------
    def enable_int8_head(self, calibration_indices=None) -> None:
        """Build the int8 VMEM head (:mod:`cuembed_tpu.ops.quant`).

        Grows the VMEM-served row coverage of the tiered mid tier by
        ``elem * W / (W + 128)`` (1.33x bf16 / 2.67x f32 at W=256) at a
        bounded per-row error (<= max|row|/254 per element) — an opt-in
        LOSSY serving mode; the exact path stays the default. Call after
        :meth:`calibrate`; re-call after :meth:`refresh_layout` or
        training updates (it is a snapshot, like any serving cache).
        ``calibration_indices`` (original ids) re-derives the slot
        capacities for the larger hot band.
        Lookups use it only when asked: ``lookup(use_int8_head=True)``
        (forward/serving only — gradients do not flow through the
        quantized copy).
        """
        from dataclasses import replace

        from cuembed_tpu.ops.quant import int8_head_rows, quantize_head
        from cuembed_tpu.utils.frequency import calibrate_capacities

        if self.tiered_cfg is None or (
            self.remap is None and not self._natural_order
        ):
            raise ValueError(
                "calibrate()/refresh_layout()/use_natural_order() first — "
                "the int8 head extends the tiered layout (or the table is "
                "VMEM-served already and needs no head)"
            )
        if self._pack_k > 1:
            raise ValueError("int8 head supports wide tables only")
        rows = min(
            self.num_categories // 8 * 8,
            int8_head_rows(self.width, self.hot_bytes),
        )
        cfg = replace(self.tiered_cfg, hot_rows=rows)
        if calibration_indices is not None:
            flat_ids = np.asarray(calibration_indices).reshape(-1)
            remapped = (
                flat_ids if self.remap is None else self.remap[flat_ids]
            )
            mid_s, cold_s = calibrate_capacities(
                remapped, None, cfg.mxu_head_rows, rows,
                cfg.chunk_elems, margin=1.15,
            )
            cfg = replace(cfg, mid_slots=mid_s, cold_slots=cold_s)
        else:
            # The wider band [mxu_head_rows, rows) absorbs rows the exact
            # layout classed cold, so the calibrated mid_slots no longer
            # bounds it — per-chunk mid counts would chronically overflow
            # and the lax.cond fallback would silently serve every batch
            # from the exact full-gather path. Sound static bound without
            # fresh calibration: mid'(chunk) <= mid(chunk) + cold(chunk).
            cfg = replace(
                cfg,
                mid_slots=min(
                    cfg.chunk_elems,
                    -(-(cfg.mid_slots + cfg.cold_slots) // 8) * 8,
                ),
            )
        self._q_head = quantize_head(self.table[:rows])
        self._q_cfg = cfg

    # -- index translation --------------------------------------------------
    def remap_indices(self, indices: np.ndarray) -> np.ndarray:
        """Host-side id->row translation (use in the input pipeline)."""
        if self.remap is None:
            return np.asarray(indices)
        return self.remap[np.asarray(indices)]

    # -- lookup --------------------------------------------------------------
    def lookup(
        self,
        indices,
        weights=None,
        offsets=None,
        *,
        assume_remapped: bool = False,
        use_int8_head: bool = False,
    ) -> jax.Array:
        """Differentiable pooled lookup; tiered-fast once calibrated.

        ``assume_remapped=True`` promises the indices already went through
        :meth:`remap_indices` (the pipeline fast path); otherwise the
        remap (if any) is applied on device.

        ``use_int8_head=True`` routes the mid tier through the quantized
        head built by :meth:`enable_int8_head` — lossy (documented bound
        there) and forward-only; fixed-hotness SUM/MEAN/weighted.
        """
        if use_int8_head:
            from cuembed_tpu.ops.tiered import tiered_forward

            if self._q_head is None:
                raise ValueError("enable_int8_head() first")
            if offsets is not None:
                raise ValueError("int8 head is fixed-hotness only")
            if weights is not None and self.mode != CombineMode.SUM:
                # Same contract every other lookup path enforces
                # (api._validate, narrow_lookup, hybrid_tiered_lookup).
                raise ValueError(
                    "weights are only supported with CombineMode.SUM"
                )
            idx = jnp.asarray(indices)
            if self.remap is not None and not assume_remapped:
                if self._remap_dev is None:
                    self._remap_dev = jnp.asarray(self.remap)
                idx = jnp.take(self._remap_dev, idx, axis=0)
            return tiered_forward(
                self.table, idx, None, weights, mode=self.mode,
                cfg=self._q_cfg,
                low_precision_math=self.low_precision_math,
                q_head=self._q_head,
            )
        remap_dev = None
        if self.remap is not None and not assume_remapped:
            if self._remap_dev is None:
                self._remap_dev = jnp.asarray(self.remap)
            remap_dev = self._remap_dev
        tiered = (
            self.tiered_cfg
            if (self.remap is not None or self._natural_order)
            else None
        )
        if self._pack_k > 1:
            from cuembed_tpu.ops.narrow import narrow_lookup
            from cuembed_tpu.ops.tiered import tiering_profitable

            if remap_dev is not None:
                indices = jnp.take(remap_dev, jnp.asarray(indices), axis=0)
            # Line-tiering loses to the plain packed gather outside the
            # measured profitable batch-shape region (up to 9x at
            # hotness 1 / width 32 — tiered.tiering_profitable); the
            # packed layout stays valid either way.
            if (
                tiered is not None
                and offsets is None
                and indices.ndim == 2
                and not tiering_profitable(indices.size, indices.shape[1])
            ):
                tiered = None
            return narrow_lookup(
                self.table, self._num_categories, self._width,
                indices, weights, offsets, mode=self.mode,
                low_precision_math=self.low_precision_math,
                tiered_cfg=tiered,
            )
        kwargs = dict(
            mode=self.mode,
            low_precision_math=self.low_precision_math,
            backend="auto",
            tiered_cfg=tiered,
            remap=remap_dev,
        )
        if offsets is not None:
            return embedding_lookup_csr(
                self.table, indices, offsets, weights, **kwargs
            )
        return embedding_lookup(self.table, indices, weights, **kwargs)


def resize_table(
    table: jax.Array,
    new_num_categories: int,
    key: Optional[jax.Array] = None,
    *,
    accum: Optional[jax.Array] = None,
):
    """Vocabulary warm-start: grow or shrink a table's row count.

    Growing appends rows drawn U(-1/sqrt(W), 1/sqrt(W)) (the collection
    init scale) — or zeros when ``key`` is None — so existing categories
    keep their trained vectors exactly. Shrinking truncates the highest
    rows; on a frequency-ordered table (:func:`cuembed_tpu.utils.
    frequency.frequency_order`) that drops the COLDEST categories, which
    is the production-sane way to cap a runaway vocabulary.

    ``accum``: an optional row-aligned optimizer state vector or array
    (row-wise AdaGrad accumulator, Adam moments) resized alongside —
    new rows get zero state. Returns ``table`` or ``(table, accum)``.

    The caller owns the id space: after a grow, ids ``[old_V, new_V)``
    become valid; after a shrink, ids must be re-capped (out-of-range
    ids would be clipped or dropped by the lookups' validation).
    """
    old_v, width = table.shape[0], table.shape[1]
    if new_num_categories == old_v:
        return table if accum is None else (table, accum)
    if new_num_categories < old_v:
        new_t = table[:new_num_categories]
        if accum is None:
            return new_t
        return new_t, accum[:new_num_categories]
    extra = new_num_categories - old_v
    if key is None:
        rows = jnp.zeros((extra, width), table.dtype)
    else:
        scale = 1.0 / (width ** 0.5)
        rows = jax.random.uniform(
            key, (extra, width), jnp.float32, -scale, scale
        ).astype(table.dtype)
    new_t = jnp.concatenate([table, rows], axis=0)
    if accum is None:
        return new_t
    pad_shape = (extra,) + tuple(accum.shape[1:])
    new_a = jnp.concatenate(
        [accum, jnp.zeros(pad_shape, accum.dtype)], axis=0
    )
    return new_t, new_a
