"""Pallas forward gather-reduce kernel (the hot path).

The TPU-native re-design of the reference's ``EmbeddingLookUpKernel``
(``cuembed/include/embedding_lookup_kernels.cuh:34-170``). The reference
maximizes loads-in-flight with a 2D CTA shape, shared-memory index staging
and an unrolled vector-load gather loop; the TPU equivalent is a DMA
pipeline:

* the grid walks batch blocks; each grid step owns ``block_samples``
  output rows,
* the block's lookup indices land in SMEM (pipelined like any other
  blocked input) so scalar reads can drive DMA address computation — the
  analog of the reference's shared-memory ``IndexLoader``
  (``embedding_lookup_ops.cuh:412-495``),
* the embedding table lives in HBM (``pl.ANY``), viewed as
  ``[rows, width//128, 128]`` so a single-row slice is legal under the
  (8, 128) tile constraint for any 128-multiple width,
* each sample's ``hotness`` rows are fetched HBM→VMEM with one async copy
  per row, double-buffered at sample granularity — while sample ``s`` is
  being reduced (VPU), all of sample ``s+1``'s row DMAs are in flight.
  With hotness 64 that is up to 128 outstanding copies: the
  "maximize loads in flight" goal of the reference (``README.md:4``),
* reduction is a vectorized ``sum`` over the ``[hotness, width]`` VMEM row
  group in fp32 (or storage precision under ``low_precision_math``),
  replacing the reference's register-resident ``Combiner``
  (``embedding_lookup_ops.cuh:162-322``).

Constraints (dispatch validates via ``pallas_forward_supported`` and
rejects unsupported calls with an error):
* ``width % 128 == 0`` (lane alignment) — pad tables for odd widths.

CSR (variable hotness) is served by a dedicated ragged kernel
(:func:`embedding_forward_pallas_csr`): a sequential grid over the flat
value stream with a carry-across-blocks sample accumulator — the forward
mirror of the run-grouped backward kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuembed_tpu.types import CombineMode, accumulation_dtype

LANES = 128
# Per-sample row-group double buffering.
NBUF = 2


def _make_fwd_kernel(
    block_samples: int,
    hotness: int,
    wtiles: int,
    acc_dtype,
    has_coeff: bool,
    post_scale: Optional[float],
    stage_out: bool = False,
):
    """Build the gather-reduce kernel body.

    Ref layout: idx_ref SMEM [bs, hot]; (coeff_ref SMEM [bs, hot] if
    has_coeff); table_ref ANY [rows, wtiles, 128]; out VMEM [bs, wtiles*128];
    scratch buf VMEM [NBUF, hot, wtiles, 128] + DMA sems [NBUF, hot];
    (acc_ref VMEM [bs, wtiles*128] acc dtype if stage_out).

    Coefficients are read as SMEM scalars and applied as scalar-broadcast
    FMAs — Mosaic has no layout for a [hot, 1, 1] vector broadcast, and a
    VMEM-resident coeff row would need exactly that.

    ``stage_out``: 16-bit outputs cannot take the per-sample dynamic
    single-row vector store (Mosaic cannot prove the offset a multiple
    of the 16-bit sublane tile); samples stage into a 32-bit accumulator
    block instead and ONE static full-block store converts at the end.
    """

    def kernel(idx_ref, *rest):
        acc_out_ref = None
        if stage_out:
            *rest, acc_out_ref = rest
        if has_coeff:
            coeff_ref, table_ref, out_ref, buf_ref, sem_ref = rest
        else:
            table_ref, out_ref, buf_ref, sem_ref = rest

        def start_sample(s, slot):
            def start_one(j, _):
                idx = idx_ref[s, j]
                pltpu.make_async_copy(
                    table_ref.at[idx], buf_ref.at[slot, j], sem_ref.at[slot, j]
                ).start()
                return 0

            jax.lax.fori_loop(0, hotness, start_one, 0, unroll=True)

        def wait_sample(slot):
            def wait_one(j, _):
                pltpu.make_async_copy(
                    table_ref.at[0], buf_ref.at[slot, j], sem_ref.at[slot, j]
                ).wait()
                return 0

            jax.lax.fori_loop(0, hotness, wait_one, 0, unroll=True)

        start_sample(0, 0)

        def body(s, _):
            slot = jax.lax.rem(s, NBUF)
            next_slot = jax.lax.rem(s + 1, NBUF)

            @pl.when(s + 1 < block_samples)
            def _():
                start_sample(s + 1, next_slot)

            wait_sample(slot)
            if has_coeff:
                def accum(j, acc):
                    c = coeff_ref[s, j]  # SMEM scalar
                    return acc + buf_ref[slot, j].astype(acc_dtype) * c

                acc = jax.lax.fori_loop(
                    0,
                    hotness,
                    accum,
                    jnp.zeros((wtiles, LANES), acc_dtype),
                )
            else:
                rows = buf_ref[slot].astype(acc_dtype)  # [hot, wtiles, 128]
                acc = jnp.sum(rows, axis=0)
                if post_scale is not None:
                    acc = acc * acc_dtype(post_scale)
            row = acc.reshape(1, wtiles * LANES)
            if stage_out:
                acc_out_ref[pl.ds(s, 1), :] = row.astype(acc_out_ref.dtype)
            else:
                out_ref[pl.ds(s, 1), :] = row.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, block_samples, body, 0)
        if stage_out:
            out_ref[...] = acc_out_ref[...].astype(out_ref.dtype)

    return kernel


def _pick_block_samples(batch: int, hotness: int, width: int, itemsize: int) -> int:
    """Block-shape heuristic, the analog of ``GetKernelLaunchParams``
    (``embedding_lookup.cuh:186-208``): as many samples per grid step as fit
    a VMEM budget alongside the double-buffered row groups."""
    vmem_budget = 6 * 1024 * 1024
    row_groups = NBUF * hotness * width * itemsize
    per_sample_out = width * 4
    avail = max(vmem_budget - row_groups, per_sample_out)
    bs = max(1, avail // (2 * per_sample_out))
    bs = min(bs, 256, batch)
    return max(8, 1 << (bs.bit_length() - 1)) if bs >= 8 else bs


@functools.partial(
    jax.jit,
    static_argnames=("mode", "low_precision_math", "interpret", "block_samples"),
)
def embedding_forward_pallas(
    table: jax.Array,
    indices: jax.Array,
    offsets: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    *,
    mode: CombineMode = CombineMode.SUM,
    low_precision_math: bool = False,
    interpret: bool = False,
    block_samples: Optional[int] = None,
) -> jax.Array:
    """Forward lookup on the Pallas gather-reduce kernel.

    Same contract as :func:`cuembed_tpu.ops.lookup_xla.embedding_forward_xla`
    minus CONCAT (a pure gather; XLA's native gather covers it).
    """
    if mode == CombineMode.CONCAT:
        raise ValueError("CONCAT is served by the XLA gather path")
    if weights is not None and mode != CombineMode.SUM:
        raise ValueError("weights are only supported with CombineMode.SUM")
    if table.shape[1] % LANES != 0:
        raise ValueError(
            f"pallas kernel requires width % {LANES} == 0, got {table.shape[1]}"
        )

    if offsets is not None:
        # Ragged CSR: the dedicated carry-across-blocks kernel (the old
        # densification path, csr_to_fixed, bounds every sample at the
        # full value capacity — quadratic at scale).
        return embedding_forward_pallas_csr(
            table, indices, offsets, weights, mode=mode,
            low_precision_math=low_precision_math, interpret=interpret,
        )
    coeff = weights
    batch, hotness = indices.shape
    width = table.shape[1]
    wtiles = width // LANES
    acc_dt = accumulation_dtype(table.dtype, low_precision_math)

    bs = block_samples or _pick_block_samples(
        batch, hotness, width, table.dtype.itemsize
    )
    padded_batch = pl.cdiv(batch, bs) * bs
    idx = indices.astype(jnp.int32)
    if padded_batch != batch:
        idx = jnp.pad(idx, ((0, padded_batch - batch), (0, 0)))
        if coeff is not None:
            coeff = jnp.pad(coeff, ((0, padded_batch - batch), (0, 0)))
    grid = (padded_batch // bs,)

    post_scale = None
    if mode == CombineMode.MEAN and coeff is None:
        post_scale = 1.0 / hotness

    stage_out = jnp.dtype(table.dtype).itemsize < 4
    kernel = _make_fwd_kernel(
        bs, hotness, wtiles, acc_dt, coeff is not None, post_scale,
        stage_out=stage_out,
    )
    # 3D view: single-row slices of a 2D (8,128)-tiled HBM array are illegal
    # for width > 128; with the row dim untiled in 3D they are always legal.
    table3 = table.reshape(table.shape[0], wtiles, LANES)

    idx_spec = pl.BlockSpec((bs, hotness), lambda b: (b, 0), memory_space=pltpu.SMEM)
    table_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((bs, width), lambda b: (b, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((padded_batch, width), table.dtype)
    scratch_shapes = [
        pltpu.VMEM((NBUF, hotness, wtiles, LANES), table.dtype),
        pltpu.SemaphoreType.DMA((NBUF, hotness)),
    ]
    if stage_out:
        # 32-bit staging block for 16-bit outputs (see _make_fwd_kernel);
        # always f32 — under low_precision_math acc_dt itself is 16-bit
        # and would hit the same store-alignment limit.
        scratch_shapes.append(pltpu.VMEM((bs, width), jnp.float32))

    if coeff is not None:
        coeff_spec = pl.BlockSpec(
            (bs, hotness), lambda b: (b, 0), memory_space=pltpu.SMEM
        )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[idx_spec, coeff_spec, table_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(idx, coeff.astype(acc_dt), table3)
    else:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[idx_spec, table_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(idx, table3)

    return out[:batch] if padded_batch != batch else out


SENTINEL = 2**31 - 1


def _make_csr_fwd_kernel(nb: int, wtiles: int, batch: int, acc_dtype,
                         has_coeff: bool):
    """Ragged-CSR gather-combine: sequential grid over value blocks.

    The CSR value stream is *sample-contiguous*, so this is the forward
    mirror of the run-grouped backward (:mod:`pallas_backward`): walk
    flat value positions, accumulate the current sample's rows in a VMEM
    accumulator, and when the sample id changes write the finished row
    to ``out[sid]`` with ONE plain store — no read-modify-write, no
    atomics, every output row has exactly one writer. A sample that
    spans a block boundary stays in the accumulator (scratch persists
    across sequential grid steps). Mirrors the reference's dynamic
    ``offsets[s]..offsets[s+1]`` loop
    (``embedding_lookup_kernels.cuh:96-135``) without its
    one-CTA-per-sample shape, which has no TPU analog.

    Ref layout: idx SMEM [1, 1, nb] (table rows, padding clamped to 0);
    sid SMEM [1, 1, nb] (sample ids, padding = SENTINEL);
    (coeff SMEM [1, 1, nb]);
    table ANY [rows, wtiles, 128]; out0 ANY aliased to out (zeros —
    zero-hotness samples are never written and must read 0).
    """

    def kernel(idx_ref, sid_ref, *rest):
        if has_coeff:
            (coeff_ref, table_ref, _, out_ref, acc_ref, out_buf, row_buf,
             carry_ref, sem_row, sem_out) = rest
        else:
            (table_ref, _, out_ref, acc_ref, out_buf, row_buf,
             carry_ref, sem_row, sem_out) = rest

        g = pl.program_id(0)
        n_blocks = pl.num_programs(0)

        @pl.when(g == 0)
        def _init():
            carry_ref[0] = SENTINEL  # no open sample
            acc_ref[...] = jnp.zeros_like(acc_ref[...])

        def row_dma(slot, p):
            return pltpu.make_async_copy(
                table_ref.at[idx_ref[0, 0, p]], row_buf.at[slot],
                sem_row.at[slot],
            )

        def flush(sid):
            """Write the finished sample row (single writer per sample)."""
            out_buf[...] = acc_ref[...].astype(out_buf.dtype)
            pltpu.make_async_copy(out_buf, out_ref.at[sid], sem_out).start()
            pltpu.make_async_copy(out_buf, out_ref.at[sid], sem_out).wait()
            acc_ref[...] = jnp.zeros_like(acc_ref[...])

        row_dma(0, 0).start()

        def body(p, _):
            slot = jax.lax.rem(p, NBUF)

            @pl.when(p + 1 < nb)
            def _():
                row_dma(jax.lax.rem(p + 1, NBUF), p + 1).start()

            sid = sid_ref[0, 0, p]
            live = (sid >= 0) & (sid < batch)
            open_sid = carry_ref[0]

            @pl.when(live & (open_sid != sid) & (open_sid != SENTINEL))
            def _flush_prev():
                flush(open_sid)

            row_dma(slot, p).wait()

            @pl.when(live)
            def _accumulate():
                carry_ref[0] = sid
                contrib = row_buf[slot].astype(acc_dtype)
                if has_coeff:
                    contrib = contrib * coeff_ref[0, 0, p]  # SMEM scalar FMA
                acc_ref[...] = acc_ref[...] + contrib

            return 0

        jax.lax.fori_loop(0, nb, body, 0)

        @pl.when(g == n_blocks - 1)
        def _final():
            open_sid = carry_ref[0]

            @pl.when(open_sid != SENTINEL)
            def _():
                flush(open_sid)

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "low_precision_math",
                                             "interpret"))
def embedding_forward_pallas_csr(
    table: jax.Array,
    indices: jax.Array,
    offsets: jax.Array,
    weights: Optional[jax.Array] = None,
    *,
    mode: CombineMode = CombineMode.SUM,
    low_precision_math: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Ragged-CSR forward on the carry-across-blocks Pallas kernel.

    Same contract as the CSR branch of
    :func:`cuembed_tpu.ops.lookup_xla.embedding_forward_xla`: ``indices``
    is the flat value array at static capacity, entries at or beyond
    ``offsets[-1]`` are padding; zero-hotness MEAN rows are 0. Unlike
    the old densification path (:func:`csr_to_fixed`, whose static
    worst-case bound is the full capacity per sample), this processes
    the ragged stream directly. Like the other Pallas kernels it is an
    explicit opt-in: per-row DMA issue costs the scalar core ~30 ns, so
    the XLA/tiered paths win at production shapes (docs/PERF_NOTES.md).
    """
    if mode == CombineMode.CONCAT:
        raise ValueError("CSR does not support CONCAT")
    if weights is not None and mode != CombineMode.SUM:
        raise ValueError("weights are only supported with CombineMode.SUM")
    width = table.shape[1]
    if width % LANES != 0:
        raise ValueError(
            f"pallas kernel requires width % {LANES} == 0, got {width}"
        )
    from cuembed_tpu.ops.transforms import extract_row_ids_from_csr

    batch = offsets.shape[0] - 1
    cap = indices.shape[0]
    wtiles = width // LANES
    acc_dt = accumulation_dtype(table.dtype, low_precision_math)

    pos = jnp.arange(cap, dtype=jnp.int32)
    live = pos < offsets[-1]
    sids = extract_row_ids_from_csr(offsets, indices).astype(jnp.int32)
    sid_arr = jnp.where(live, sids, SENTINEL)
    vals = jnp.where(live, indices.astype(jnp.int32), 0)

    coeff = None
    if weights is not None:
        coeff = weights.astype(jnp.float32)
    if mode == CombineMode.MEAN:
        counts = (offsets[1:] - offsets[:-1]).astype(jnp.float32)
        inv = jnp.where(counts == 0, 0.0, 1.0 / jnp.maximum(counts, 1.0))
        per_pos = jnp.take(inv, jnp.clip(sids, 0, batch - 1))
        coeff = per_pos if coeff is None else coeff * per_pos
    if coeff is not None:
        coeff = jnp.where(live, coeff, 0.0)

    nb = min(cap, 512)
    pad = (-cap) % nb
    if pad:
        vals = jnp.pad(vals, (0, pad))
        sid_arr = jnp.pad(sid_arr, (0, pad), constant_values=SENTINEL)
        if coeff is not None:
            coeff = jnp.pad(coeff, (0, pad))
    n_blocks = vals.shape[0] // nb

    table3 = table.reshape(table.shape[0], wtiles, LANES)
    out0 = jnp.zeros((batch, wtiles, LANES), table.dtype)

    # The streams ride as [n_blocks, 1, nb] 3D operands blocked at
    # (1, 1, nb): Mosaic requires the last two block dims be divisible by
    # (8, 128) or EQUAL to the array's — (1, nb) vs array (1, nb) is
    # equal, so the block is legal for any n_blocks, and the stream keeps
    # SMEM residency bounded at nb entries per grid step (a whole-array
    # SMEM operand would cap the kernel at SMEM size). Verified on chip:
    # 2D blocked (1, nb) with n_blocks > 1 is rejected by the front end.
    vals = vals.reshape(n_blocks, 1, nb)
    sid_arr = sid_arr.reshape(n_blocks, 1, nb)
    stream_spec = pl.BlockSpec(
        (1, 1, nb), lambda g: (g, 0, 0), memory_space=pltpu.SMEM
    )
    in_specs = [stream_spec, stream_spec]
    args = [vals, sid_arr]
    if coeff is not None:
        in_specs.append(stream_spec)
        args.append(coeff.astype(acc_dt).reshape(n_blocks, 1, nb))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # table
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # aliased out0
    args += [table3, out0]

    out = pl.pallas_call(
        _make_csr_fwd_kernel(nb, wtiles, batch, acc_dt, coeff is not None),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((batch, wtiles, LANES), table.dtype),
        scratch_shapes=[
            pltpu.VMEM((wtiles, LANES), acc_dt),          # accumulator
            pltpu.VMEM((wtiles, LANES), table.dtype),     # out write buf
            pltpu.VMEM((NBUF, wtiles, LANES), table.dtype),  # row stream
            pltpu.SMEM((1,), jnp.int32),                  # open sample id
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={len(args) - 1: 0},
        interpret=interpret,
    )(*args)
    return out.reshape(batch, width)


@functools.partial(jax.jit, static_argnames=("mode",))
def csr_to_fixed(indices, offsets, weights=None, *, mode=CombineMode.SUM):
    """Densify a CSR problem into fixed layout + coefficient mask.

    Returns ``(dense_indices [batch, capacity], coeff [batch, capacity])``.
    Padded slots point at row 0 with coeff 0, contributing nothing. MEAN
    semantics (1/h_s, zero-hotness -> 0) are folded into the coefficients.
    """
    batch = offsets.shape[0] - 1
    cap = indices.shape[0]
    counts = (offsets[1:] - offsets[:-1]).astype(jnp.int32)
    max_h = cap  # static worst-case bound
    from cuembed_tpu.ops.transforms import extract_row_ids_from_csr

    pos = jnp.arange(cap, dtype=jnp.int32)
    sample = extract_row_ids_from_csr(offsets, indices).astype(jnp.int32)
    rank = pos - jnp.take(offsets, sample).astype(jnp.int32)
    live = pos < offsets[-1]

    dense_idx = jnp.zeros((batch, max_h), jnp.int32)
    dense_idx = dense_idx.at[sample, rank].set(
        jnp.where(live, indices.astype(jnp.int32), 0), mode="drop"
    )
    w = (
        weights.astype(jnp.float32)
        if weights is not None
        else jnp.ones((cap,), jnp.float32)
    )
    w = jnp.where(live, w, 0.0)
    coeff = jnp.zeros((batch, max_h), jnp.float32)
    coeff = coeff.at[sample, rank].set(w, mode="drop")
    if mode == CombineMode.MEAN:
        inv = jnp.where(
            counts == 0, 0.0, 1.0 / jnp.maximum(counts, 1).astype(jnp.float32)
        )
        coeff = coeff * inv[:, None]
    return dense_idx, coeff
