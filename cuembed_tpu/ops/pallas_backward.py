"""Pallas sorted-COO backward kernel (placeholder — XLA path is live).

The deterministic segment backward currently runs on the XLA-composed path
(:func:`cuembed_tpu.ops.lookup_xla.embedding_backward_xla`). A dedicated
Pallas kernel (grid over nnz blocks, run-boundary carry across sequential
grid steps, VMEM run accumulator, row DMA writes — the no-atomics redesign
of ``EmbeddingBackwardKernel``, ``embedding_lookup_kernels.cuh:175-286``)
lands here; until then :func:`supported` reports False and dispatch falls
back.
"""

from __future__ import annotations


def supported(grad_y, num_categories) -> bool:
    return False


def embedding_backward_pallas(*args, **kwargs):  # pragma: no cover
    raise NotImplementedError("pallas backward not yet implemented")
