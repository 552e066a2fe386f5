"""Pallas sorted-COO backward kernel — run-grouped, carry across blocks.

The TPU-native re-design of the reference's ``EmbeddingBackwardKernel``
(``cuembed/include/embedding_lookup_kernels.cuh:175-286``). The reference
stages nz-blocks in shared memory, accumulates each sorted run in
registers, and resolves run/block boundaries with ``atomicAdd``
(``embedding_lookup_ops.cuh:554-563, 647-662``). A TPU grid executes
sequentially, which removes the need for atomics entirely:

* the grid walks nnz blocks; each block's ``(index, sample, coeff)``
  triplets arrive in SMEM (the shared-memory ``GradIndexLoader`` analog),
* ``grad_y`` rows stream HBM→VMEM with double-buffered async copies,
* each sorted run accumulates into a VMEM scratch accumulator; when the
  index changes the finished run is flushed with one read-modify-write
  of its output row — runs are contiguous after the sort, so every
  output row has exactly ONE writer and the result is deterministic
  (the reference's own framework test needs ``allclose`` because of its
  atomics, ``examples/pytorch/cuembed_test.py:33``),
* a run that spans a block boundary simply stays in the accumulator —
  scratch persists across sequential grid steps (the carry replaces the
  reference's ``should_atomic`` boundary flags),
* the gradient buffer is an aliased input, so ``initial_grad``
  (the reference's ``skip_grad_init=true`` contract,
  ``embedding_lookup.cuh:455-461``) falls out naturally.

Measured reality check (docs/PERF_NOTES.md): every per-row access costs
the scalar core ~30 ns of DMA issue, so this kernel sustains ~20-30 M
nnz/s against the XLA path's ~90 M rows/s sorted scatter — dispatch
keeps the XLA lowering unless ``backend="pallas"`` is requested. The
kernel exists because it is the honest TPU expression of the reference's
design; the measured gap is the documented reason the production path
is sort + scatter.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NBUF = 2
SENTINEL = 2**31 - 1


def supported(grad_y, num_categories, width: Optional[int] = None) -> bool:
    """Shape coverage of the kernel (explicit ``backend='pallas'`` only)."""
    w = width if width is not None else grad_y.shape[-1]
    return w % LANES == 0 and grad_y.dtype in (
        jnp.float32, jnp.bfloat16, jnp.float16
    )


def _make_bwd_kernel(nb: int, wtiles: int, num_categories: int,
                     has_coeff: bool):
    def kernel(idx_ref, sid_ref, *rest):
        if has_coeff:
            coeff_ref, gy_ref, _, out_ref, acc_ref, row_buf, gy_buf, \
                carry_ref, sem_gy, sem_row = rest
        else:
            gy_ref, _, out_ref, acc_ref, row_buf, gy_buf, carry_ref, \
                sem_gy, sem_row = rest

        g = pl.program_id(0)
        n_blocks = pl.num_programs(0)

        @pl.when(g == 0)
        def _init():
            carry_ref[0] = SENTINEL  # no open run
            acc_ref[...] = jnp.zeros_like(acc_ref[...])

        def gy_dma(slot, p):
            return pltpu.make_async_copy(
                gy_ref.at[sid_ref[0, 0, p]], gy_buf.at[slot], sem_gy.at[slot]
            )

        def flush(row):
            """Add the open accumulator into output row (one writer)."""
            pltpu.make_async_copy(
                out_ref.at[row], row_buf, sem_row
            ).start()
            pltpu.make_async_copy(
                out_ref.at[row], row_buf, sem_row
            ).wait()
            row_buf[...] = (
                row_buf[...].astype(jnp.float32) + acc_ref[...]
            ).astype(row_buf.dtype)
            pltpu.make_async_copy(
                row_buf, out_ref.at[row], sem_row
            ).start()
            pltpu.make_async_copy(
                row_buf, out_ref.at[row], sem_row
            ).wait()
            acc_ref[...] = jnp.zeros_like(acc_ref[...])

        # warm up: first gy row of this block
        gy_dma(0, 0).start()

        def body(p, _):
            slot = jax.lax.rem(p, NBUF)

            @pl.when(p + 1 < nb)
            def _():
                gy_dma(jax.lax.rem(p + 1, NBUF), p + 1).start()

            row = idx_ref[0, 0, p]
            live = (row >= 0) & (row < num_categories)
            open_row = carry_ref[0]

            @pl.when(live & (open_row != row) & (open_row != SENTINEL))
            def _flush_prev():
                flush(open_row)

            gy_dma(slot, p).wait()

            @pl.when(live)
            def _accumulate():
                carry_ref[0] = row
                contrib = gy_buf[slot].astype(jnp.float32)
                if has_coeff:
                    contrib = contrib * coeff_ref[0, 0, p]
                acc_ref[...] = acc_ref[...] + contrib

            return 0

        jax.lax.fori_loop(0, nb, body, 0)

        @pl.when(g == n_blocks - 1)
        def _final():
            open_row = carry_ref[0]

            @pl.when(open_row != SENTINEL)
            def _():
                flush(open_row)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_categories", "interpret"))
def embedding_backward_pallas(
    grad_y: jax.Array,
    num_categories: int,
    transpose_indices: jax.Array,
    transpose_sample_ids: jax.Array,
    transpose_weights: Optional[jax.Array] = None,
    *,
    nnz: Optional[jax.Array] = None,
    initial_grad: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Full-table gradient from index-sorted COO via the Pallas kernel.

    Same contract as :func:`cuembed_tpu.ops.lookup_xla.embedding_backward_xla`
    (padding must carry an int32-max sentinel index; ``initial_grad`` is
    the ``skip_grad_init`` analog). Accumulation is fp32; the output is
    ``grad_y.dtype``.
    """
    cap = transpose_indices.shape[0]
    width = grad_y.shape[1]
    if width % LANES != 0:
        raise ValueError("pallas backward needs width % 128 == 0")
    wtiles = width // LANES

    nb = min(cap, 512)
    pad = (-cap) % nb
    t_idx = transpose_indices.astype(jnp.int32)
    t_sid = transpose_sample_ids.astype(jnp.int32)
    if nnz is not None:
        pos = jnp.arange(cap, dtype=jnp.int32)
        t_idx = jnp.where(pos < nnz, t_idx, SENTINEL)
    if pad:
        t_idx = jnp.pad(t_idx, (0, pad), constant_values=SENTINEL)
        t_sid = jnp.pad(t_sid, (0, pad))
    n_blocks = t_idx.shape[0] // nb

    gy3 = grad_y.reshape(grad_y.shape[0], wtiles, LANES)
    grad0 = (
        jnp.zeros((num_categories, width), grad_y.dtype)
        if initial_grad is None
        else initial_grad.astype(grad_y.dtype)
    ).reshape(num_categories, wtiles, LANES)

    has_coeff = transpose_weights is not None
    # [n_blocks, 1, nb] blocked at (1, 1, nb): Mosaic requires the last
    # two block dims be divisible by (8, 128) or EQUAL to the array's —
    # (1, nb) is equal, so the block is legal for any n_blocks. 1D (nb,)
    # blocked operands (and 2D (1, nb) blocks) fail Mosaic/XLA layout
    # verification on real chips whenever n_blocks > 1.
    stream_spec = pl.BlockSpec(
        (1, 1, nb), lambda g: (g, 0, 0), memory_space=pltpu.SMEM
    )
    in_specs = [stream_spec, stream_spec]
    args = [t_idx.reshape(-1, 1, nb), t_sid.reshape(-1, 1, nb)]
    if has_coeff:
        t_w = transpose_weights.astype(jnp.float32)
        if pad:
            t_w = jnp.pad(t_w, (0, pad))
        in_specs.append(stream_spec)
        args.append(t_w.reshape(-1, 1, nb))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # grad_y
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # aliased grad
    args += [gy3, grad0]

    out = pl.pallas_call(
        _make_bwd_kernel(nb, wtiles, num_categories, has_coeff),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (num_categories, wtiles, LANES), grad_y.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((wtiles, LANES), jnp.float32),       # acc
            pltpu.VMEM((wtiles, LANES), grad_y.dtype),       # row RMW buf
            pltpu.VMEM((NBUF, wtiles, LANES), grad_y.dtype),  # gy rows
            pltpu.SMEM((1,), jnp.int32),                      # carry row
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={len(args) - 1: 0},
        interpret=interpret,
    )(*args)
    return out.reshape(num_categories, width)
