"""Tiered (hot/cold) embedding lookup — the TPU bandwidth design.

Why this exists
===============

The reference reaches speed-of-light HBM bandwidth on GPUs because its
gather kernel keeps hundreds of 16-byte loads in flight and the L2 serves
the power-law-hot rows (``README.md:4``; its application-bandwidth metric
counts every logical row read, ``manual_benchmark.cu:250-261``). A TPU
TensorCore has no hardware gather: every random row becomes a descriptor
on the DMA engine. Measured on TPU v5e (see ``docs/PERF_NOTES.md``):

* random row gather from HBM:            ~80 M rows/s (any row size)
* random row gather from a <~100 MB operand: ~300-360 M rows/s
  (XLA places it in the 128 MiB VMEM)
* streaming:                              ~680 GB/s

So the TPU-native equivalent of the GPU L2 is an explicit **VMEM-resident
hot head**: the table is stored frequency-ordered (hottest categories get
the lowest row ids — the framework's ``reorder`` utilities maintain the
permutation), rows ``[0, hot_rows)`` are served by the fast in-VMEM
gather, and the power-law tail is *compacted* and gathered from HBM at
descriptor rate.

The fixed-hotness pipeline is **3-tier** (all static shapes, one jit):

1. **MXU head** (rows ``< mxu_head_rows``, the extreme power-law head —
   ~35% of multi-hot traffic at alpha=1.15): combined by a one-hot
   matmul ``M @ table[:head]`` built from a fused compare-reduce — zero
   per-row accesses.
2. **Compaction**: indices viewed as ``[chunks, chunk_elems]``; one
   vectorized row-wise sort per chunk keyed mid | head | cold (packed
   with the index into a single int32 key) puts the mid tier at a
   static front slice and the cold tier at a static back slice.
3. **VMEM mid tier**: compacted hot-but-not-head slots gather from
   ``table[:hot_rows]`` at VMEM-operand rate (~300 M rows/s).
4. **HBM cold tier**: compacted tail slots gather from the full table at
   descriptor rate (~80 M rows/s) — 5-10x fewer descriptors than naive.
5. **Scatter-free combines**: per-chunk one-hot matmuls on the MXU with
   coefficients folded into the small one-hot operand, so gathered rows
   stream in storage precision (mixed-dtype dots).
6. **Overflow safety**: if any chunk exceeds a static capacity, a
   ``lax.cond`` takes the exact naive path — always correct.

CSR uses the 2-tier variant (full-width hot gather + compacted cold with
a scatter combine); CONCAT is a pure gather and is not tiered.

Measured on the reference flagship workload (10M x 256 bf16, batch 64K,
hotness 64, alpha=1.15 permuted ids): 22.3 ms / 97.9 GB/s application
bandwidth — 2.33x over the plain XLA path; 3.2x on the 1M-category fp32
sweep point (docs/PERF_NOTES.md).

Numerics: accumulation is fp32 (or storage precision under
``low_precision_math``). Within a sample, hot positions accumulate in
index order and cold positions are added afterwards — a reassociation of
the reference's strictly sequential per-sample loop
(``embedding_lookup_cpu.hpp:35-94``), so parity tests use a small
tolerance rather than bitwise equality on this path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from math import sqrt
from typing import Optional

import jax
import jax.numpy as jnp

from cuembed_tpu.ops.transforms import extract_row_ids_from_csr
from cuembed_tpu.types import CombineMode, accumulation_dtype

# Default VMEM budget for the hot head. v5e/v5p have 128 MiB of VMEM; the
# VMEM-rate gather held to 112 MB operands in measurement (gather_rates.py:
# 296-322 M rows/s bf16 at 96-112 MB), so keep a small headroom under that.
# These module constants are the v5e fallback; the ACTIVE values come from
# cuembed_tpu.utils.chip.chip_constants(), which re-derives them from a
# committed on-chip measurement record (benchmarks/calibrate_chip.py) for
# the attached device kind — the TPU analog of the reference querying its
# device instead of hardcoding (embedding_lookup.cuh:356-363).
DEFAULT_HOT_BYTES = 108 * 1024 * 1024

# Tables at or below this size are served entirely by the fast in-VMEM
# gather — the tiered split would only add overhead.
VMEM_TABLE_BYTES = 108 * 1024 * 1024


def _chip():
    from cuembed_tpu.utils.chip import chip_constants

    return chip_constants()


@dataclass(frozen=True)
class TieredConfig:
    """Static configuration of the tiered lookup (hashable; jit-static).

    Attributes:
      hot_rows: rows ``[0, hot_rows)`` are the VMEM-resident hot head.
      chunk_elems: compaction granularity (flattened index positions per
        chunk); must be a multiple of the fixed hotness.
      cold_slots: static per-chunk capacity for compacted cold entries.
        Size at mean + 6 sigma of the expected per-chunk cold count; an
        overflowing batch falls back to the exact path via ``lax.cond``.
    """

    hot_rows: int
    chunk_elems: int = 1024
    cold_slots: int = 256
    # Rows [0, mxu_head_rows) — the extreme power-law head (~60% of all
    # draws at alpha=1.15) — are combined on the MXU via a one-hot matmul
    # instead of per-row gathers, sidestepping the per-row descriptor
    # bound entirely. Fixed-hotness only; 0 disables (2-tier path).
    mxu_head_rows: int = 128
    # Static per-chunk capacity for compacted mid-tier (hot-but-not-head)
    # entries; only used by the 3-tier fixed-hotness path.
    mid_slots: int = 640
    # Calibrated fraction of positions NOT hitting the MXU head (with
    # margin). Bounds the backward's post-sort scatter width tighter
    # than the slot-fraction default; None falls back to
    # (mid_slots + cold_slots) / chunk_elems.
    nonhead_frac: Optional[float] = None
    # Backward MXU segment-reduce (see lookup_xla._compressed_scatter):
    # the run-heavy prefix of the index-sorted non-head stream (the mid
    # tier's long runs) is segment-reduced by per-chunk one-hot matmuls
    # instead of a row scatter (~3x the scatter's row rate, measured).
    # bwd_seg_slots = per-chunk local-unique capacity (0 disables);
    # bwd_run_frac = calibrated fraction of nnz in the run-heavy prefix.
    bwd_seg_chunk: int = 2048
    bwd_seg_slots: int = 0
    bwd_run_frac: float = 0.0
    # CSR scatter-free combine: static bound on the number of samples a
    # chunk's positions may span. When 0 < csr_chunk_samples, the CSR
    # forward combines per chunk with a local-sample one-hot matmul and
    # one small merge scatter instead of a full-position segment-sum
    # (measured 1.19 ms vs 2.36 ms at 262K live positions, GS=320 —
    # benchmarks/profile_csr.py). The matmul cost scales with this
    # capacity, so auto_config engages it when the balanced span bound
    # (2*chunk/hotness + 64) stays under ~chunk/3 — avg hotness >= ~8
    # with default chunking; calibration measures the real spans.
    csr_chunk_samples: int = 0
    # CSR live-position capacity: a static bound on ``offsets[-1]``.
    # CSR callers pass a value buffer at worst-case capacity (batch *
    # max_hotness) while the live prefix is typically ~half of it; every
    # per-position cost (gathers, combines, scatters) then runs at 2x.
    # The live prefix is CONTIGUOUS (CSR padding sits at the tail), so a
    # calibrated capacity turns into a free static slice — measured 7.64
    # -> 3.17 ms on the capacity-bound full gather alone
    # (benchmarks/profile_csr.py). A batch with offsets[-1] >
    # csr_live_cap falls back to the exact full-capacity path via the
    # same ``lax.cond`` that guards the slot capacities. 0 = serve the
    # full buffer (always exact).
    csr_live_cap: int = 0


def tiering_profitable(positions: int, avg_hotness: float) -> bool:
    """Measured batch-shape law: does tiering beat the plain XLA gather?

    The chunked sort + one-hot MXU combine carries fixed per-chunk costs
    that only amortize with enough total positions, and its one-hot
    combine only pays when several positions share a sample (hotness).
    Over the full round-4 on-chip sweep (``benchmarks/results_v5e_r4.csv``,
    108 points, both widths/vocabularies) the tiered engine wins 1.7-3.6x
    whenever ``avg_hotness >= 4`` **and** ``positions >= 32768``, and
    loses everywhere outside that region — up to 9x at hotness 1 /
    width 32 (the per-chunk one-hot degenerates toward a square
    [chunk, group] matmul) and ~1.2-2.1x at 16K-position batches where
    the per-chunk machinery dominates. Auto-dispatch uses this gate;
    ``backend="tiered"`` remains an explicit override. The thresholds
    re-derive per chip from the committed measurement record
    (``cuembed_tpu.utils.chip``); the v5e law is the fallback.
    """
    c = _chip()
    return (
        avg_hotness >= c["tiering_min_hotness"]
        and positions >= c["tiering_min_positions"]
    )


def _capacity(chunk_elems: int, p: float) -> int:
    """Static slot count for a binomial(chunk_elems, p) load, mean + 6σ."""
    p = min(max(p, 1e-3), 1.0)
    mean = chunk_elems * p
    slots = int(mean + 6.0 * sqrt(chunk_elems * p * (1.0 - p)) + 1)
    return min(chunk_elems, max(8, -(-slots // 8) * 8))


def auto_config(
    num_categories: int,
    width: int,
    itemsize: int,
    hotness: int = 1,
    *,
    cold_fraction: float = 0.25,
    head_fraction: float = 0.45,
    hot_bytes: Optional[int] = None,
    vmem_table_bytes: Optional[int] = None,
) -> Optional[TieredConfig]:
    """Pick a tiered config, or None when the whole table is VMEM-served.

    ``cold_fraction`` / ``head_fraction`` are the expected fractions of
    lookups missing the hot head / hitting the MXU head rows; they only
    size the static capacities (correctness never depends on them thanks
    to the overflow fallback). Calibrate with
    :func:`cuembed_tpu.utils.frequency.tier_fractions`. ``hot_bytes`` /
    ``vmem_table_bytes`` default to the attached chip's measured record
    (``cuembed_tpu.utils.chip``).
    """
    if hot_bytes is None:
        hot_bytes = _chip()["hot_bytes"]
    if vmem_table_bytes is None:
        vmem_table_bytes = _chip()["vmem_table_bytes"]
    table_bytes = num_categories * width * itemsize
    if table_bytes <= vmem_table_bytes:
        return None
    row_bytes = width * itemsize
    hot_rows = min(num_categories, max(8, hot_bytes // row_bytes))
    if hot_rows >= num_categories:
        return None
    hotness = max(1, hotness)
    # ~2048 positions per chunk: relative capacity slack shrinks ~1/sqrt(E)
    # while the row-wise sort stays cheap (measured optimum on v5e).
    group = max(1, 2048 // hotness)
    chunk_elems = group * hotness
    mid_fraction = max(0.02, 1.0 - cold_fraction - head_fraction)
    # CSR scatter-free combine: capacity = 2x the balanced per-chunk
    # sample share + slack. The combine's one-hot matmul + merge cost
    # scales with this capacity; measured on v5e it beats the live
    # segment-sum (2.36 ms at 262K positions) up to GS ~ chunk/3
    # (GS=576: 1.85 ms f32 / combine-only break-even near GS~700 —
    # benchmarks/profile_csr.py). Below the bound the exact segment-sum
    # path serves; re-derive the threshold per chip generation.
    csr_samples = min(chunk_elems, 2 * chunk_elems // hotness + 64)
    return TieredConfig(
        hot_rows=int(hot_rows),
        chunk_elems=chunk_elems,
        cold_slots=_capacity(chunk_elems, cold_fraction),
        # 256 measured ~5% faster than 128 at the flagship (the bigger
        # compare-reduce cube costs less than the mid-tier descriptors
        # it absorbs; 512 is flat vs 256) — benchmarks/retune_headline.py,
        # committed grid in benchmarks/results_r5/retune_r5.csv.
        mxu_head_rows=min(256, int(hot_rows)),
        mid_slots=_capacity(chunk_elems, mid_fraction),
        csr_chunk_samples=(
            csr_samples
            if csr_samples <= max(256, chunk_elems // 3)
            else 0
        ),
    )


def csr_combine_config(
    num_categories: int,
    avg_hotness: float,
    *,
    chunk_elems: int = 2048,
    live_cap: int = 0,
) -> Optional[TieredConfig]:
    """Combine-only CSR config: no frequency ordering required.

    With ``hot_rows >= num_categories`` the engine skips the hot/cold
    classing sort entirely (one full-table gather serves every slot) and
    keeps the scatter-free per-chunk combine + live-capacity slice —
    the two CSR costs that dominate regardless of the traffic
    distribution (``benchmarks/profile_csr.py``: the live segment-sum
    alone is 2.36 ms where the combine is 1.19 ms at 262K positions).
    This is the right config for uniform (alpha=0) traffic and for
    tables without a calibrated frequency order. Returns None when the
    combine would not pay (low average hotness — the one-hot capacity
    approaches the chunk size).
    """
    hotness = max(1, int(avg_hotness))
    csr_samples = min(chunk_elems, 2 * chunk_elems // hotness + 64)
    if csr_samples > max(256, chunk_elems // 3) and live_cap <= 0:
        return None
    return TieredConfig(
        hot_rows=int(num_categories),
        chunk_elems=chunk_elems,
        cold_slots=0,
        mxu_head_rows=0,
        mid_slots=0,
        csr_chunk_samples=(
            csr_samples
            if csr_samples <= max(256, chunk_elems // 3)
            else 0
        ),
        csr_live_cap=int(live_cap),
    )


def _combine_coeff(indices, weights, offsets, mode, acc_dt):
    """Per-position combine coefficient (weight, 1, or 1/hotness)."""
    if weights is not None:
        coeff = weights.astype(acc_dt)
    else:
        coeff = jnp.ones(indices.shape, acc_dt)
    if mode == CombineMode.MEAN:
        if offsets is None:
            coeff = coeff / indices.shape[1]
        else:
            batch = offsets.shape[0] - 1
            hot = (offsets[1:] - offsets[:-1]).astype(acc_dt)
            inv = jnp.where(hot == 0, 0.0, 1.0 / jnp.maximum(hot, 1.0))
            sm = extract_row_ids_from_csr(offsets, indices)
            coeff = coeff * jnp.take(inv, sm)
    return coeff


@partial(
    jax.jit,
    static_argnames=("mode", "cfg", "low_precision_math", "pack_k"),
)
def tiered_forward(
    table: jax.Array,
    indices: jax.Array,
    offsets: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    *,
    mode: CombineMode = CombineMode.SUM,
    cfg: TieredConfig,
    low_precision_math: bool = False,
    pack_k: int = 1,
    q_head=None,
) -> jax.Array:
    """Tiered forward lookup. Same contract as ``embedding_forward_xla``
    minus CONCAT (a pure gather — tiering cannot help it).

    Fixed-hotness: ``indices [batch, hotness]``; served by the 3-tier
    pipeline (MXU head / compacted VMEM mid / compacted HBM cold) when
    ``cfg.mxu_head_rows > 0``, else by the 2-tier path. CSR: flat
    ``indices [capacity]`` + ``offsets [batch+1]`` (positions >=
    ``offsets[-1]`` are padding); served by the live-sliced scatter-free
    combine engine when ``cfg.csr_chunk_samples > 0``
    (:func:`_forward_csr_combine`) and by the live-sliced hot/cold
    segment-sum otherwise.

    ``pack_k > 1``: the table is a *line-packed narrow* table
    (:func:`cuembed_tpu.ops.narrow.pack_narrow` — ``[ceil(V/k), k*W]``
    with ``k = 128 // W`` logical rows per 128-lane line), and
    ``indices`` address *logical* rows. Tiering then happens on lines
    (each gather fetches a full line at the 128-lane rate) and the
    sub-row selection folds into the one-hot combine for free: the
    one-hot column encodes ``(sample, idx % k)`` jointly, and the diag
    block of the matmul output extracts the addressed sub-row.
    ``cfg`` stays in logical-row units (``auto_config`` on the logical
    shape gives consistent line budgets: ``hot_rows`` logical rows ==
    ``hot_rows / k`` lines == the same VMEM bytes). Fixed-hotness only
    (``cfg.mxu_head_rows > 0``); CSR callers use the plain packed path.
    """
    if mode == CombineMode.CONCAT:
        raise ValueError("CONCAT is a pure gather; tiered path does not apply")
    if weights is not None and mode != CombineMode.SUM:
        # Same contract as every other lookup path (api._validate,
        # embedding_forward_xla, narrow_lookup): a silent weighted-mean
        # on one backend vs a raise on another is a dispatch hazard.
        raise ValueError("weights are only supported with CombineMode.SUM")
    if pack_k > 1 and (offsets is not None or cfg.mxu_head_rows <= 0):
        raise ValueError(
            "pack_k > 1 (line-packed narrow tiering) supports the "
            "fixed-hotness 3-tier path only"
        )
    if q_head is not None:
        # Opt-in lossy int8 mid tier (ops/quant.py): the VMEM head slice
        # is the quantized copy, so the classing boundary is its row
        # count, not cfg.hot_rows. Fixed-hotness 3-tier only.
        if pack_k > 1 or offsets is not None or cfg.mxu_head_rows <= 0:
            raise ValueError(
                "q_head (int8 head) supports the fixed-hotness 3-tier "
                "path only"
            )
        if q_head.width != table.shape[1]:
            raise ValueError("q_head width must match the table")
    acc_dt = accumulation_dtype(table.dtype, low_precision_math)
    coeff = _combine_coeff(indices, weights, offsets, mode, acc_dt)
    if offsets is None and cfg.mxu_head_rows > 0:
        # Unweighted fixed-hotness coefficients are one constant (1 or
        # 1/hotness): the sort can skip the coefficient payload.
        uniform = None
        if weights is None:
            uniform = (
                1.0 / indices.shape[1] if mode == CombineMode.MEAN else 1.0
            )
        out = _forward_fixed_3tier(
            table, indices, coeff, cfg, acc_dt, uniform, k=pack_k,
            q_head=q_head,
        )
        if q_head is not None:
            # Forward/serving only: jax.grad through the quantized mid
            # tier would silently drop its table-gradient contribution
            # (the quantization round's gradient is zero) — refuse at
            # trace time instead (ops/quant.py).
            from cuembed_tpu.ops.quant import serving_only_guard

            out = serving_only_guard(out)
        return out
    # 2-tier uniform coefficient: any unweighted case whose coefficient
    # is one constant over LIVE positions (CSR MEAN varies per sample).
    uniform2 = None
    if weights is None and (offsets is None or mode != CombineMode.MEAN):
        uniform2 = (
            1.0 / indices.shape[1]
            if (mode == CombineMode.MEAN and offsets is None)
            else 1.0
        )
    if (
        offsets is not None
        and 0 < cfg.csr_chunk_samples <= cfg.chunk_elems
        and table.shape[0] < (1 << 30)  # key packing headroom
    ):
        return _forward_csr_combine(
            table, indices, offsets, coeff, cfg, acc_dt, uniform2
        )
    if offsets is not None:
        return _forward_csr_segsum(
            table, indices, offsets, coeff, cfg, acc_dt, uniform2
        )
    return _forward_2tier(
        table, indices, offsets, coeff, mode, cfg, acc_dt, uniform2
    )


def _forward_fixed_3tier(table, indices, coeff, cfg, acc_dt, uniform=None,
                         k=1, q_head=None):
    """Fixed-hotness forward over three tiers, one sort, no full-N gather.

    Positions are classed head (``idx < HEAD``), mid (``HEAD <= idx <
    hot_rows``) or cold. One row-wise sort per chunk orders them
    mid | head | cold, so the mid block is a static front slice and the
    cold block a static back slice — the only per-row gathers are over
    the *compacted* mid (VMEM rate) and cold (HBM rate) slots. The head —
    the bulk of power-law traffic — never gathers at all: a one-hot
    matmul combines it on the MXU. Coefficients ride the small one-hot
    operands, so gathered rows stream in storage precision.

    ``k > 1``: line-packed narrow table (see :func:`tiered_forward`);
    gathers fetch lines ``idx // k`` and the combine one-hot column is
    ``sample * k + idx % k``.

    ``q_head``: opt-in int8 mid tier (:mod:`cuembed_tpu.ops.quant`) —
    the VMEM slice is the quantized copy (covering ~2x the rows of the
    exact slice for the same bytes), its inline per-row scale rides the
    gathered line and folds into the one-hot combine coefficient. The
    MXU head (rows < HEAD) and the cold tier stay exact; the overflow
    fallback serves from the exact table (strictly more accurate).
    """
    batch, hotness = indices.shape
    width = table.shape[1] // k  # logical width (== table width if k == 1)
    v_logical = table.shape[0] * k
    C = cfg.hot_rows - cfg.hot_rows % k  # whole lines only
    if q_head is not None:
        C = q_head.rows  # int8 classing boundary: the quantized coverage
    HEAD = min(cfg.mxu_head_rows, C)
    HEAD -= HEAD % k
    E = cfg.chunk_elems
    if E % hotness != 0:
        raise ValueError(
            f"chunk_elems ({E}) must be a multiple of hotness ({hotness}); "
            "use auto_config(..., hotness=...)"
        )
    GS = E // hotness  # samples per chunk
    S_c = min(cfg.cold_slots, E)
    S_m = min(cfg.mid_slots, E)

    nmax = batch * hotness
    flat = indices.reshape(-1).astype(jnp.int32)
    cf = coeff.reshape(-1)
    padded = -(-nmax // E) * E
    if padded != nmax:
        # Padding targets row 0 (head) with coefficient 0 — inert (the
        # head matmul uses per-position coefficients, never `uniform`,
        # and the sorted tiers apply `uniform` only to live slots).
        flat = jnp.pad(flat, (0, padded - nmax))
        cf = jnp.pad(cf, (0, padded - nmax))
    G = padded // E

    xi = flat.reshape(G, E)
    wi = cf.reshape(G, E)
    sm = jax.lax.broadcasted_iota(jnp.int32, (G, E), 1) // hotness
    key = jnp.where(xi < HEAD, 1, jnp.where(xi < C, 0, 2))

    cnt_mid = jnp.sum((key == 0).astype(jnp.int32), axis=1)
    cnt_cold = jnp.sum((key == 2).astype(jnp.int32), axis=1)
    overflow = jnp.any(cnt_mid > S_m) | jnp.any(cnt_cold > S_c)

    # Sort-operand minimization. The dominant cost is the row-wise sort,
    # which scales with operand count:
    #  * unweighted: the constant coefficient never rides the sort (slot
    #    coefficients reconstruct from liveness),
    #  * (tier, idx) pack into one int32 key when the table fits 2^28,
    #  * (tier, idx, sample-in-chunk) pack into one int32 when
    #    2 + ceil(log2 V) + ceil(log2 GS) <= 31 — a pure key-only sort
    #    for the unweighted flagship shape.
    idx_bits = max(1, (v_logical - 1).bit_length())
    gs_bits = max(1, (GS - 1).bit_length())
    w_s = None
    if uniform is not None and 2 + idx_bits + gs_bits <= 31:
        comp = (((key << idx_bits) | xi) << gs_bits) | sm
        (comp,) = jax.lax.sort([comp], dimension=1, num_keys=1)
        s_s = comp & ((1 << gs_bits) - 1)
        x_s = (comp >> gs_bits) & ((1 << idx_bits) - 1)
    elif v_logical <= (1 << 28) - 1:
        if uniform is not None:
            comp, s_s = jax.lax.sort(
                [(key << 28) | xi, sm], dimension=1, num_keys=1
            )
        else:
            comp, w_s, s_s = jax.lax.sort(
                [(key << 28) | xi, wi, sm], dimension=1, num_keys=1
            )
        x_s = comp & ((1 << 28) - 1)
    elif uniform is not None:
        _, x_s, s_s = jax.lax.sort([key, xi, sm], dimension=1, num_keys=1)
    else:
        _, x_s, w_s, s_s = jax.lax.sort(
            [key, xi, wi, sm], dimension=1, num_keys=1
        )

    KGS = GS * k  # one-hot columns: (sample, sub-row) pairs when k > 1

    def combine(rows, cols, slot_coeff=None):
        """[G, S, k*W] rows + [G, S] one-hot column -> [G*GS, W] via MXU.

        Rows stay in storage precision: XLA supports mixed-dtype dots
        (bf16 rows x f32 one-hot -> f32) and it measures ~5x faster than
        promoting the row block to f32 first (which materializes a full
        f32 copy of the gathered rows). Dead slots are masked by an
        out-of-range column (== GS*k): their one-hot row is all zeros,
        so no per-slot coefficient multiply is needed in the uniform
        case (``slot_coeff=None``).

        For k == 1 the column is the sample-in-chunk. For line-packed
        tables (k > 1) it encodes ``sample * k + sub-row``: the dot
        produces per-(sample, sub) sums of whole gathered lines, and the
        diagonal block ``[j, j*W:(j+1)*W]`` extracts the sub-row each
        slot addressed (off-diagonal blocks — the other sub-rows riding
        the same lines — are discarded).
        """
        onehot = (
            cols[..., None] == jnp.arange(KGS, dtype=jnp.int32)
        ).astype(acc_dt)
        if slot_coeff is not None:
            onehot = onehot * slot_coeff[..., None]
        part = jax.lax.dot_general(
            onehot,  # [G, S, GS*k]
            rows,    # [G, S, k*W]
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=acc_dt,
            precision=jax.lax.Precision.HIGHEST,
        )  # [G, GS*k, k*W]
        if k == 1:
            return part.reshape(G * GS, width)
        part = part.reshape(G, GS, k, k, width)
        part = jnp.diagonal(part, axis1=2, axis2=3)  # [G, GS, W, k]
        return jnp.sum(part, axis=-1).reshape(G * GS, width)

    def col_of(samples, idx):
        return samples * k + idx % k if k > 1 else samples

    def take_lines(src, idx2d):
        """Gather logical rows (k == 1) or their lines (k > 1)."""
        i = (idx2d // k if k > 1 else idx2d).reshape(-1)
        return jnp.take(src, i, axis=0).reshape(*idx2d.shape, k * width)

    def fast(_):
        # mid tier: static front slice, gather from the VMEM hot head
        # (the int8 copy when q_head is given — its inline per-row scale
        # becomes a slot coefficient, so dequant costs no extra pass
        # beyond the int8->bf16 convert feeding the MXU).
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (G, S_m), 1)
        m_live = iota_m < cnt_mid[:, None]
        m_idx = jnp.where(m_live, x_s[:, :S_m], 0)
        m_scale = None
        if q_head is None:
            m_rows = take_lines(table[: C // k], m_idx)
        else:
            from cuembed_tpu.ops.quant import extract_scales

            m_lines = jnp.take(
                q_head.data, m_idx.reshape(-1), axis=0
            ).reshape(G, S_m, width + 128)
            m_scale = extract_scales(m_lines)  # [G, S_m] f32
            m_rows = m_lines[..., :width].astype(jnp.bfloat16)
        # cold tier: static back slice, gather from the full HBM table.
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (G, S_c), 1)
        c_live = iota_c >= (S_c - cnt_cold)[:, None]
        c_idx = jnp.where(c_live, x_s[:, E - S_c:], 0)
        c_rows = take_lines(table, c_idx)
        if w_s is None:
            # Liveness rides the one-hot column (dead -> GS*k, a miss);
            # the uniform coefficient scales the pooled output once
            # instead of every slot.
            m_sm = jnp.where(m_live, col_of(s_s[:, :S_m], m_idx), KGS)
            c_sm = jnp.where(c_live, col_of(s_s[:, E - S_c:], c_idx), KGS)
            m_cf = (
                None if m_scale is None
                else jnp.where(m_live, m_scale, 0.0)
            )
            out = combine(m_rows, m_sm, m_cf) + combine(c_rows, c_sm)
            return out[:batch] * acc_dt(uniform)
        m_cf = jnp.where(m_live, w_s[:, :S_m], 0.0)
        if m_scale is not None:
            m_cf = m_cf * m_scale
        c_cf = jnp.where(c_live, w_s[:, E - S_c:], 0.0)
        out = combine(m_rows, col_of(s_s[:, :S_m], m_idx), m_cf) + combine(
            c_rows, col_of(s_s[:, E - S_c:], c_idx), c_cf
        )
        return out[:batch]

    def exact(_):
        # Rare capacity overflow: plain full gather (slow, always right).
        # Head positions are excluded — the MXU head matmul below the
        # cond serves them on both branches.
        cfe = jnp.where(flat[:nmax] < HEAD, 0.0, cf[:nmax])
        if k == 1:
            rows = jnp.take(table, flat[:nmax], axis=0).astype(acc_dt)
        else:
            lines = jnp.take(table, flat[:nmax] // k, axis=0)
            lines = lines.reshape(nmax, k, width)
            sub = (flat[:nmax] % k)[:, None] == jnp.arange(
                k, dtype=jnp.int32
            )[None, :]
            rows = jnp.sum(
                jnp.where(sub[:, :, None], lines.astype(acc_dt), 0.0), axis=1
            )
        rows = rows * cfe[:, None]
        return jnp.sum(rows.reshape(batch, hotness, width), axis=1)

    out = jax.lax.cond(overflow, exact, fast, 0)

    # head tier: M[b, c] = sum of coefficients hitting row c < HEAD
    # (ops/head.py's shared compare-reduce — never materializes the
    # one-hot), then one MXU matmul against the head slice. A uniform
    # coefficient uses the cheaper count-matrix form and scales after.
    from cuembed_tpu.ops.head import head_matrix

    if uniform is not None:
        m = head_matrix(indices, None, HEAD, acc_dt)
        if uniform != 1.0:
            m = m * uniform
    else:
        m = head_matrix(indices, coeff, HEAD, acc_dt)
    # Mixed-dtype dot (f32 M x storage-dtype head slice): measured 6x
    # over upcasting the slice to f32 first (gather_rates.py) — the MXU
    # consumes the bf16 operand natively and accumulates f32. For k > 1
    # the head slice unpacks by a contiguous (row-major) reshape: the
    # first HEAD logical rows are exactly the first HEAD/k lines.
    head_slice = (
        table[:HEAD] if k == 1
        else table[: HEAD // k].reshape(HEAD, width)
    )
    out = out + jax.lax.dot_general(
        m,
        head_slice,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_dt,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(table.dtype)


def _forward_csr_combine(table, indices, offsets, coeff, cfg, acc_dt,
                         uniform=None):
    """CSR forward with live-capacity slicing + scatter-free combines.

    Three measured CSR costs drive this design (all numbers from
    ``benchmarks/profile_csr.py`` at the round-4 gap point — V=1M,
    W=128, B=32768, avg hotness 8, 262K live of 524K capacity):

    1. **Live slicing.** CSR callers pass value buffers at worst-case
       capacity; the live prefix is contiguous, so a calibrated
       ``cfg.csr_live_cap`` becomes a free static slice that halves
       every per-position cost (full-capacity gather 7.64 ms -> live
       3.17 ms).
    2. **Scatter-free combine.** CSR positions are sample-sorted, so a
       chunk of ``E`` positions spans at most ``csr_chunk_samples``
       samples (calibrated): the combine is a per-chunk local-sample
       one-hot matmul (bf16 one-hot when unweighted — {0,1} values are
       exact) plus ONE merge scatter of ``[chunks * GS]`` pooled rows —
       1.19 ms where the full-position segment-sum costs 2.36 ms.
    3. **Optional hot/cold classing.** With a frequency-ordered table
       (``hot_rows < num_categories``) one cheap per-chunk sort
       (0.1-0.4 ms) compacts cold positions to a static back slice;
       the front gathers from the VMEM head slice at ~3.3 ns/row vs
       ~12 ns from HBM (0.87 vs 3.17 ms here). With ``hot_rows >=
       num_categories`` (``csr_combine_config``) the sort is skipped
       entirely and one full-table gather serves every slot — the
       right mode for uniform traffic or unordered tables.

    Any capacity violation (live overflow, chunk span > GS, cold count
    > cold_slots) falls back to the exact full-capacity segment-sum via
    one ``lax.cond``.
    """
    width = table.shape[1]
    V = table.shape[0]
    C = min(cfg.hot_rows, V)
    classed = C < V
    E = cfg.chunk_elems
    S_c = min(cfg.cold_slots, E) if classed else 0
    GS = min(cfg.csr_chunk_samples, E)

    batch = offsets.shape[0] - 1
    cap = indices.shape[0]
    pos = jnp.arange(cap, dtype=jnp.int32)
    live_f = pos < offsets[-1]
    idx_f = jnp.where(live_f, indices.astype(jnp.int32), 0)
    coeff_f = (
        None if uniform is not None else jnp.where(live_f, coeff, 0.0)
    )
    sm_f = extract_row_ids_from_csr(offsets, indices).astype(jnp.int32)

    # ---- static live capacity -> slice length n (chunk-aligned) --------
    n = cap
    if 0 < cfg.csr_live_cap < cap:
        n = min(cap, -(-cfg.csr_live_cap // E) * E)
    padded = -(-n // E) * E
    G = padded // E

    def view(x, fill):
        x = x[:n]
        if padded != n:
            x = jnp.pad(x, (0, padded - n), constant_values=fill)
        return x.reshape(G, E)

    xi = view(idx_f, 0)
    lv = view(live_f, False)
    sm = view(sm_f, 0)
    wi = None if coeff_f is None else view(coeff_f, 0)
    first_sample = sm[:, :1]  # [G, 1]
    # dead positions -> local sample GS (one-hot miss); clamp keeps the
    # tail-pad chunks (sm fill 0 < first) in packing range.
    local = jnp.clip(jnp.where(lv, sm - first_sample, GS), 0, GS)

    live_ok = (
        jnp.bool_(True) if n >= cap else offsets[-1] <= n
    )
    span_ok = jnp.max(jnp.where(lv, local, 0)) < GS
    overflow = ~live_ok | ~span_ok
    if classed:
        cnt_cold = jnp.sum((lv & (xi >= C)).astype(jnp.int32), axis=1)
        overflow = overflow | jnp.any(cnt_cold > S_c)

    if classed:
        # Sort each chunk hot | cold. Operand-minimized like the fixed
        # path: unweighted packs (tier, idx, local) into ONE int32 key
        # when the bits fit; otherwise local rides as a payload.
        key = (xi >= C).astype(jnp.int32)
        idx_bits = max(1, (V - 1).bit_length())
        gs_bits = max(1, GS.bit_length())
        if wi is None and 1 + idx_bits + gs_bits <= 31:
            comp = (((key << idx_bits) | xi) << gs_bits) | local
            (comp,) = jax.lax.sort([comp], dimension=1, num_keys=1)
            l_s = comp & ((1 << gs_bits) - 1)
            x_s = (comp >> gs_bits) & ((1 << idx_bits) - 1)
        elif wi is None:
            comp, l_s = jax.lax.sort(
                [(key << 30) | xi, local], dimension=1, num_keys=1
            )
            x_s = comp & ((1 << 30) - 1)
        else:
            comp, w_sorted, l_s = jax.lax.sort(
                [(key << 30) | xi, wi, local], dimension=1, num_keys=1
            )
            x_s = comp & ((1 << 30) - 1)
        w_s = None if wi is None else w_sorted
    else:
        x_s, l_s, w_s = xi, local, wi

    # bf16 one-hots are exact for {0,1} and feed the MXU natively;
    # weighted combines carry the f32 coefficient on the one-hot.
    oh_dt = jnp.bfloat16 if w_s is None else acc_dt

    def combine(rows, locals_, slot_coeff=None):
        onehot = (
            locals_[..., None] == jnp.arange(GS, dtype=jnp.int32)
        ).astype(oh_dt)
        if slot_coeff is not None:
            onehot = onehot * slot_coeff[..., None]
        return jax.lax.dot_general(
            onehot, rows,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=acc_dt,
            precision=jax.lax.Precision.HIGHEST,
        )  # [G, GS, W]

    def fast(_):
        F = E - S_c  # front slots (all-hot under the capacity guard)
        f_idx = jnp.clip(x_s[:, :F], 0, C - 1)
        f_rows = table[:C].at[f_idx.reshape(-1)].get(
            mode="promise_in_bounds"
        )
        part = combine(
            f_rows.reshape(G, F, width), l_s[:, :F],
            None if w_s is None else w_s[:, :F],
        )
        if S_c > 0:
            # back slice: trailing hot + all cold — gather from the full
            # table (correct for both; the handful of hot slots here pay
            # HBM rate, bounded by cold_slots).
            b_rows = table.at[x_s[:, F:].reshape(-1)].get(
                mode="promise_in_bounds"
            )
            part = part + combine(
                b_rows.reshape(G, S_c, width), l_s[:, F:],
                None if w_s is None else w_s[:, F:],
            )
        # merge: chunk g's local sample u is global sample first[g] + u;
        # boundary samples receive adds from both neighbouring chunks.
        tgt = (first_sample + jnp.arange(GS, dtype=jnp.int32)[None, :])
        out = jnp.zeros((batch, width), acc_dt).at[tgt.reshape(-1)].add(
            part.reshape(G * GS, width), mode="drop"
        )
        return out if w_s is not None else out * acc_dt(uniform or 1.0)

    def exact(_):
        cf = (
            jnp.where(live_f, acc_dt(uniform), 0.0)
            if coeff_f is None
            else coeff_f
        )
        rows = jnp.take(table, idx_f, axis=0)
        rows = rows.astype(acc_dt) * cf[:, None]
        return jax.ops.segment_sum(
            rows, sm_f, num_segments=batch, indices_are_sorted=True,
        )

    out = jax.lax.cond(overflow, exact, fast, 0)
    return out.astype(table.dtype)


def _forward_csr_segsum(table, indices, offsets, coeff, cfg, acc_dt,
                        uniform=None):
    """CSR forward via hot gather + sorted segment-sum, live-sliced.

    Serves CSR workloads whose average hotness is too low for the
    scatter-free combine (``csr_chunk_samples == 0`` — the one-hot
    capacity would approach the chunk size). Structure: every live
    position gathers from the VMEM hot head (cold positions clipped to
    an inert row-0/coeff-0 read) and pools through one sorted
    ``segment_sum``; cold positions compact per chunk to a static back
    slice, gather from the full table, and scatter-add on top. All of
    it runs on the live prefix (``cfg.csr_live_cap``) — the dominant
    costs here are per-position, and CSR buffers are typically ~2x
    padded (measured: 7.64 -> 3.17 ms on the gather alone,
    ``benchmarks/profile_csr.py``).
    """
    width = table.shape[1]
    V = table.shape[0]
    C = min(cfg.hot_rows, V)
    classed = C < V
    E = cfg.chunk_elems
    S = min(cfg.cold_slots, E) if classed else 0

    batch = offsets.shape[0] - 1
    cap = indices.shape[0]
    pos = jnp.arange(cap, dtype=jnp.int32)
    live_f = pos < offsets[-1]
    idx_f = jnp.where(live_f, indices.astype(jnp.int32), 0)
    coeff_f = (
        jnp.where(live_f, acc_dt(uniform), 0.0)
        if uniform is not None
        else jnp.where(live_f, coeff, 0.0)
    )
    sm_f = extract_row_ids_from_csr(offsets, indices).astype(jnp.int32)

    n = cap
    if 0 < cfg.csr_live_cap < cap:
        n = min(cap, -(-cfg.csr_live_cap // E) * E)
    padded = -(-n // E) * E
    G = padded // E

    def view(x, fill):
        x = x[:n]
        if padded != n:
            x = jnp.pad(x, (0, padded - n), constant_values=fill)
        return x.reshape(G, E)

    xi = view(idx_f, 0)
    lv = view(live_f, False)
    sm = view(sm_f, 0)
    wi = view(coeff_f, 0)

    live_ok = jnp.bool_(True) if n >= cap else offsets[-1] <= n
    overflow = ~live_ok
    if classed:
        is_cold = lv & (xi >= C)
        counts = jnp.sum(is_cold.astype(jnp.int32), axis=1)
        overflow = overflow | jnp.any(counts > S)

    def fast(_):
        # hot tier: dense gather of every live slot from the VMEM head
        # (cold slots clipped to an inert row-0 / coeff-0 read), pooled
        # by ONE sorted segment-sum over the live prefix.
        hot_sel = lv if not classed else (lv & (xi < C))
        h_idx = jnp.where(hot_sel, xi, 0).reshape(-1)
        h_cf = jnp.where(hot_sel, wi, 0.0).reshape(-1)
        hrows = table[:C].at[h_idx].get(mode="promise_in_bounds")
        hrows = hrows.astype(acc_dt) * h_cf[:, None]
        out = jax.ops.segment_sum(
            hrows, sm.reshape(-1), num_segments=batch,
            indices_are_sorted=True,
        )
        if not classed:
            return out
        # cold tier: compact per chunk (cold sorts first), gather the
        # static front slice from the full table, scatter-add by sample.
        key = jnp.where(is_cold, 0, 1)
        if V <= (1 << 28) - 1:
            comp, w_s, s_s = jax.lax.sort(
                [(key << 28) | xi, wi, sm], dimension=1, num_keys=1
            )
            x_s = comp & ((1 << 28) - 1)
        else:
            _, x_s, w_s, s_s = jax.lax.sort(
                [key, xi, wi, sm], dimension=1, num_keys=1
            )
        slot_live = (
            jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
            < counts[:, None]
        )
        c_idx = jnp.where(slot_live, x_s[:, :S], 0)
        c_cf = jnp.where(slot_live, w_s[:, :S], 0.0)
        c_sm = jnp.where(slot_live, s_s[:, :S], 0)
        crows = table.at[c_idx.reshape(-1)].get(
            mode="promise_in_bounds"
        ).astype(acc_dt)
        crows = crows * c_cf.reshape(-1)[:, None]
        return out.at[c_sm.reshape(-1)].add(crows, mode="drop")

    def exact(_):
        rows = jnp.take(table, idx_f, axis=0).astype(acc_dt)
        rows = rows * coeff_f[:, None]
        return jax.ops.segment_sum(
            rows, sm_f, num_segments=batch, indices_are_sorted=True,
        )

    if not classed and n >= cap:
        out = exact(0)  # nothing to guard; identical work
    else:
        out = jax.lax.cond(overflow, exact, fast, 0)
    return out.astype(table.dtype)


def _forward_2tier(table, indices, offsets, coeff, mode, cfg, acc_dt,
                   uniform=None):
    """Hot/cold forward: full-batch gather from the VMEM hot head plus a
    per-chunk compacted cold gather. Serves fixed-hotness lookups with
    the MXU head disabled (CSR routes to :func:`_forward_csr_combine` /
    :func:`_forward_csr_segsum`)."""
    del offsets  # fixed-hotness only
    width = table.shape[1]
    C = cfg.hot_rows
    E = cfg.chunk_elems
    S = min(cfg.cold_slots, E)

    batch, hotness = indices.shape
    flat_idx = indices.reshape(-1).astype(jnp.int32)
    flat_coeff = coeff.reshape(-1)
    nmax = batch * hotness
    if E % hotness != 0:
        raise ValueError(
            f"chunk_elems ({E}) must be a multiple of hotness "
            f"({hotness}); use auto_config(..., hotness=...)"
        )

    # --- pad the flat stream to a whole number of chunks -----------------
    padded = -(-nmax // E) * E
    if padded != nmax:
        pad = padded - nmax
        flat_idx = jnp.pad(flat_idx, (0, pad))          # idx 0 => hot
        flat_coeff = jnp.pad(flat_coeff, (0, pad))      # coeff 0 => inert
    G = padded // E

    is_cold = flat_idx >= C

    # --- hot tier: dense gather from the VMEM-resident head --------------
    hot_idx = jnp.where(is_cold, 0, flat_idx)
    hot_coeff = jnp.where(is_cold, 0.0, flat_coeff)
    hrows = jnp.take(table[:C], hot_idx, axis=0).astype(acc_dt)
    hrows = hrows * hot_coeff[:, None]
    out = jnp.sum(hrows[:nmax].reshape(batch, hotness, width), axis=1)

    # --- cold tier: compact -> gather -> combine --------------------------
    xi = flat_idx.reshape(G, E)
    ci = is_cold.reshape(G, E)
    wi = flat_coeff.reshape(G, E)
    sm = (
        jax.lax.broadcasted_iota(jnp.int32, (G, E), 0) * (E // hotness)
        + jax.lax.broadcasted_iota(jnp.int32, (G, E), 1) // hotness
    )

    counts = jnp.sum(ci.astype(jnp.int32), axis=1)
    overflow = jnp.any(counts > S)

    key = jnp.where(ci, 0, 1).astype(jnp.int32)  # cold sorts first
    # Tail padding (coeff 0) carries index 0 => hot key, so it never
    # reaches the cold slices; with a uniform coefficient the sort can
    # therefore skip the coefficient payload (slot coeff = live * scale).
    if table.shape[0] <= (1 << 28) - 1:
        if uniform is not None:
            comp, s_s = jax.lax.sort(
                [(key << 28) | xi, sm], dimension=1, num_keys=1
            )
            w_s = None
        else:
            comp, w_s, s_s = jax.lax.sort(
                [(key << 28) | xi, wi, sm], dimension=1, num_keys=1
            )
        x_s = comp & ((1 << 28) - 1)
    elif uniform is not None:
        _, x_s, s_s = jax.lax.sort([key, xi, sm], dimension=1, num_keys=1)
        w_s = None
    else:
        _, x_s, w_s, s_s = jax.lax.sort(
            [key, xi, wi, sm], dimension=1, num_keys=1
        )
    slot_live = (
        jax.lax.broadcasted_iota(jnp.int32, (G, S), 1) < counts[:, None]
    )
    cold_idx = jnp.where(slot_live, x_s[:, :S], 0)
    cold_coeff = (
        None if w_s is None else jnp.where(slot_live, w_s[:, :S], 0.0)
    )
    cold_sm = jnp.where(slot_live, s_s[:, :S], 0)

    def cold_fast(_):
        crows = jnp.take(table, cold_idx.reshape(-1), axis=0)
        crows = crows.reshape(G, S, width)
        gs = E // hotness  # samples per chunk
        if cold_coeff is None:
            # Liveness via an out-of-range local sample (one-hot
            # miss); uniform coefficient applied once at the end.
            sm_l = jnp.where(slot_live, s_s[:, :S] % gs, gs)
            onehot = (
                sm_l[..., None] == jnp.arange(gs, dtype=jnp.int32)
            ).astype(acc_dt)
        else:
            onehot = (
                cold_sm[..., None] % gs
                == jnp.arange(gs, dtype=jnp.int32)
            ).astype(acc_dt) * cold_coeff[..., None]
        part = jax.lax.dot_general(
            onehot,
            crows,  # storage dtype; mixed dot, see 3-tier combine
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=acc_dt,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_c = part.reshape(G * gs, width)[:batch]
        return out_c * acc_dt(uniform) if cold_coeff is None else out_c

    def cold_exact(_):
        # Rare overflow path: serve every cold position straight from HBM.
        c_idx = jnp.where(is_cold, flat_idx, 0)
        c_coeff = jnp.where(is_cold, flat_coeff, 0.0)
        rows = jnp.take(table, c_idx[:nmax], axis=0).astype(acc_dt)
        rows = rows * c_coeff[:nmax, None]
        return jnp.sum(rows.reshape(batch, hotness, width), axis=1)

    out = out + jax.lax.cond(overflow, cold_exact, cold_fast, 0)
    return out.astype(table.dtype)
