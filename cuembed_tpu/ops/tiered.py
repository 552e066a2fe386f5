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
DEFAULT_HOT_BYTES = 108 * 1024 * 1024

# Tables at or below this size are served entirely by the fast in-VMEM
# gather — the tiered split would only add overhead.
VMEM_TABLE_BYTES = 108 * 1024 * 1024


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
    # one small merge scatter instead of a full-position segment-sum.
    # auto_config engages it at avg hotness >= ~10 with default chunking
    # (the matmul cost scales with the sample capacity — see the gate).
    csr_chunk_samples: int = 0


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
    ``backend="tiered"`` remains an explicit override. Re-derive per
    chip generation from the sweep.
    """
    return avg_hotness >= 4 and positions >= 32768


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
    hot_bytes: int = DEFAULT_HOT_BYTES,
    vmem_table_bytes: int = VMEM_TABLE_BYTES,
) -> Optional[TieredConfig]:
    """Pick a tiered config, or None when the whole table is VMEM-served.

    ``cold_fraction`` / ``head_fraction`` are the expected fractions of
    lookups missing the hot head / hitting the MXU head rows; they only
    size the static capacities (correctness never depends on them thanks
    to the overflow fallback). Calibrate with
    :func:`cuembed_tpu.utils.frequency.tier_fractions`.
    """
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
    # sample share + slack. The combine's one-hot matmul cost scales
    # with this capacity, so the gate below (capacity <= chunk/4)
    # engages it only when chunks span few samples — with the default
    # 2048-element chunks that is avg hotness >= ~10. Lower hotness
    # (where the capacity would approach the chunk size and the matmul
    # would dwarf the scatter it replaces) takes the exact 2-tier
    # segment-sum path; re-evaluate the threshold per chip generation.
    csr_samples = min(chunk_elems, 2 * chunk_elems // hotness + 64)
    return TieredConfig(
        hot_rows=int(hot_rows),
        chunk_elems=chunk_elems,
        cold_slots=_capacity(chunk_elems, cold_fraction),
        mxu_head_rows=min(128, int(hot_rows)),
        mid_slots=_capacity(chunk_elems, mid_fraction),
        csr_chunk_samples=(
            csr_samples if csr_samples <= chunk_elems // 4 else 0
        ),
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
    ``offsets[-1]`` are padding); always 2-tier — its scatter-based
    combine would cancel the mid-tier win.

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
        return _forward_csr_3tier(
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


def _forward_csr_3tier(table, indices, offsets, coeff, cfg, acc_dt,
                       uniform=None):
    """CSR forward with scatter-free per-chunk combines.

    The 2-tier CSR path's dominant cost is the full-position
    ``segment_sum`` (a row scatter over every nonzero, ~80-90 M rows/s).
    CSR positions are sample-sorted, so a chunk of ``E`` consecutive
    positions spans at most ``csr_chunk_samples`` samples (capacity,
    calibrated ~2x the balanced share): the combine becomes a per-chunk
    local-sample one-hot matmul — like the fixed-hotness path but with
    a *local sample* payload riding the sort — plus one merge scatter
    of ``[chunks, csr_chunk_samples]`` pooled partials at global sample
    offsets (chunk-boundary samples accumulate across both chunks).

    Tiers: hot (``idx < hot_rows``) sorts to the front and gathers from
    the VMEM head slice; cold compacts to the back and gathers from the
    full table. Chunks that span more than ``csr_chunk_samples`` samples
    or overflow ``cold_slots`` fall back to the exact 2-tier path.
    """
    width = table.shape[1]
    C = cfg.hot_rows
    E = cfg.chunk_elems
    S_c = min(cfg.cold_slots, E)
    GS = min(cfg.csr_chunk_samples, E)

    batch = offsets.shape[0] - 1
    nmax = indices.shape[0]
    pos = jnp.arange(nmax, dtype=jnp.int32)
    live = pos < offsets[-1]
    flat_idx = jnp.where(live, indices.astype(jnp.int32), 0)
    flat_coeff = (
        None if uniform is not None
        else jnp.where(live, coeff, 0.0)
    )
    sample_of_pos = extract_row_ids_from_csr(offsets, indices).astype(
        jnp.int32
    )

    padded = -(-nmax // E) * E
    if padded != nmax:
        pad = padded - nmax
        flat_idx = jnp.pad(flat_idx, (0, pad))
        live = jnp.pad(live, (0, pad))
        if flat_coeff is not None:
            flat_coeff = jnp.pad(flat_coeff, (0, pad))
        sample_of_pos = jnp.pad(
            sample_of_pos, (0, pad), mode="edge"
        )
    G = padded // E

    xi = flat_idx.reshape(G, E)
    sm = sample_of_pos.reshape(G, E)
    lv = live.reshape(G, E)
    first_sample = sm[:, :1]  # [G, 1]
    local = sm - first_sample
    # dead positions -> local sample GS (one-hot miss)
    local = jnp.where(lv, local, GS)

    cnt_cold = jnp.sum((xi >= C).astype(jnp.int32), axis=1)
    span_ok = jnp.max(jnp.where(lv, local, 0)) < GS
    overflow = jnp.any(cnt_cold > S_c) | ~span_ok

    key = jnp.where(xi < C, 0, 1)
    if flat_coeff is None:
        comp, l_s = jax.lax.sort(
            [(key << 30) | xi, local], dimension=1, num_keys=1
        )
        w_s = None
    else:
        comp, w_s, l_s = jax.lax.sort(
            [(key << 30) | xi, flat_coeff.reshape(G, E), local],
            dimension=1, num_keys=1,
        )
    x_s = comp & ((1 << 30) - 1)

    def combine(rows, locals_, slot_coeff=None):
        onehot = (
            locals_[..., None] == jnp.arange(GS, dtype=jnp.int32)
        ).astype(acc_dt)
        if slot_coeff is not None:
            onehot = onehot * slot_coeff[..., None]
        return jax.lax.dot_general(
            onehot, rows,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=acc_dt,
            precision=jax.lax.Precision.HIGHEST,
        )  # [G, GS, W]

    def fast(_):
        # hot region: front slice is the whole row minus the cold back —
        # gather every slot from the VMEM head slice (dead/cold slots
        # have local == GS, a one-hot miss; index clipped into range).
        h_idx = jnp.where(x_s < C, x_s, 0)
        h_loc = jnp.where(x_s < C, l_s, GS)
        h_rows = jnp.take(table[:C], h_idx.reshape(-1), axis=0)
        part = combine(
            h_rows.reshape(G, E, width), h_loc,
            None if w_s is None else w_s,
        )
        # cold region: static back slice, gather from the full table.
        c_idx = x_s[:, E - S_c:]
        c_loc = jnp.where(c_idx >= C, l_s[:, E - S_c:], GS)
        c_idx = jnp.where(c_idx >= C, c_idx, 0)
        c_rows = jnp.take(table, c_idx.reshape(-1), axis=0)
        part = part + combine(
            c_rows.reshape(G, S_c, width), c_loc,
            None if w_s is None else w_s[:, E - S_c:],
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
            jnp.where(live, acc_dt(uniform), 0.0)[:nmax]
            if flat_coeff is None
            else flat_coeff.reshape(-1)[:nmax]
        )
        rows = jnp.take(table, flat_idx.reshape(-1)[:nmax], axis=0)
        rows = rows.astype(acc_dt) * cf[:, None]
        return jax.ops.segment_sum(
            rows, sample_of_pos[:nmax], num_segments=batch,
            indices_are_sorted=True,
        )

    out = jax.lax.cond(overflow, exact, fast, 0)
    return out.astype(table.dtype)


def _forward_2tier(table, indices, offsets, coeff, mode, cfg, acc_dt,
                   uniform=None):
    """Hot/cold forward: full-batch gather from the VMEM hot head plus a
    per-chunk compacted cold gather. Serves CSR (scatter combine) and
    fixed-hotness with the MXU head disabled."""
    width = table.shape[1]
    C = cfg.hot_rows
    E = cfg.chunk_elems
    S = min(cfg.cold_slots, E)

    if offsets is None:
        batch, hotness = indices.shape
        flat_idx = indices.reshape(-1).astype(jnp.int32)
        flat_coeff = coeff.reshape(-1)
        nmax = batch * hotness
        sample_of_pos = None  # derived from position
        if E % hotness != 0:
            raise ValueError(
                f"chunk_elems ({E}) must be a multiple of hotness "
                f"({hotness}); use auto_config(..., hotness=...)"
            )
    else:
        batch = offsets.shape[0] - 1
        nmax = indices.shape[0]
        hotness = None
        pos = jnp.arange(nmax, dtype=jnp.int32)
        live = pos < offsets[-1]
        flat_idx = jnp.where(live, indices.astype(jnp.int32), 0)
        flat_coeff = jnp.where(live, coeff, 0.0)
        sample_of_pos = extract_row_ids_from_csr(offsets, indices).astype(
            jnp.int32
        )

    # --- pad the flat stream to a whole number of chunks -----------------
    padded = -(-nmax // E) * E
    if padded != nmax:
        pad = padded - nmax
        flat_idx = jnp.pad(flat_idx, (0, pad))          # idx 0 => hot
        flat_coeff = jnp.pad(flat_coeff, (0, pad))      # coeff 0 => inert
        if sample_of_pos is not None:
            sample_of_pos = jnp.pad(sample_of_pos, (0, pad))
    G = padded // E

    is_cold = flat_idx >= C

    # --- hot tier: dense gather from the VMEM-resident head --------------
    hot_idx = jnp.where(is_cold, 0, flat_idx)
    hot_coeff = jnp.where(is_cold, 0.0, flat_coeff)
    hrows = jnp.take(table[:C], hot_idx, axis=0).astype(acc_dt)
    hrows = hrows * hot_coeff[:, None]
    if offsets is None:
        out = jnp.sum(hrows[:nmax].reshape(batch, hotness, width), axis=1)
    else:
        out = jax.ops.segment_sum(
            hrows[:nmax], sample_of_pos[:nmax], num_segments=batch,
            indices_are_sorted=True,
        )

    # --- cold tier: compact -> gather -> combine --------------------------
    xi = flat_idx.reshape(G, E)
    ci = is_cold.reshape(G, E)
    wi = flat_coeff.reshape(G, E)
    if offsets is None:
        sm = (
            jax.lax.broadcasted_iota(jnp.int32, (G, E), 0) * (E // hotness)
            + jax.lax.broadcasted_iota(jnp.int32, (G, E), 1) // hotness
        )
    else:
        sm = sample_of_pos.reshape(G, E)

    counts = jnp.sum(ci.astype(jnp.int32), axis=1)
    overflow = jnp.any(counts > S)

    key = jnp.where(ci, 0, 1).astype(jnp.int32)  # cold sorts first
    # Dead CSR padding (coeff 0) carries index 0 => hot key, so it never
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
        if offsets is None:
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
        cc = (
            slot_live.astype(acc_dt) * acc_dt(uniform)
            if cold_coeff is None
            else cold_coeff
        )
        crows = crows.astype(acc_dt) * cc[..., None]
        flat_rows = crows.reshape(G * S, width)
        return jnp.zeros((batch, width), acc_dt).at[
            cold_sm.reshape(-1)
        ].add(flat_rows, mode="drop")

    def cold_exact(_):
        # Rare overflow path: serve every cold position straight from HBM.
        c_idx = jnp.where(is_cold, flat_idx, 0)
        c_coeff = jnp.where(is_cold, flat_coeff, 0.0)
        rows = jnp.take(table, c_idx[:nmax], axis=0).astype(acc_dt)
        rows = rows * c_coeff[:nmax, None]
        if offsets is None:
            return jnp.sum(rows.reshape(batch, hotness, width), axis=1)
        return jax.ops.segment_sum(
            rows, sample_of_pos[:nmax], num_segments=batch,
            indices_are_sorted=True,
        )

    out = out + jax.lax.cond(overflow, cold_exact, cold_fast, 0)
    return out.astype(table.dtype)
