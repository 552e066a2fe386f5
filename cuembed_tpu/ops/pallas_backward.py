"""Pallas sorted-COO backward kernel — measured out, kept as a stub.

The deterministic segment backward runs on the XLA-composed path
(:func:`cuembed_tpu.ops.lookup_xla.embedding_backward_xla`: one sorted
scatter-add) plus the tiered MXU-head matmul (``ops/api.py``) and the
sparse-update trainers (``cuembed_tpu/train.py``).

A hand-written Pallas kernel for this op class was prototyped and
measured slower than the XLA emitters on v5e (docs/PERF_NOTES.md):
per-row ``make_async_copy`` issued from the scalar core sustains
~34 M rows/s against XLA's ~80 M rows/s HBM scatter/gather loops, and
Mosaic offers no vectorized arbitrary-index gather/scatter to beat them
with. The no-atomics redesign of the reference's
``EmbeddingBackwardKernel`` (``embedding_lookup_kernels.cuh:175-286``,
run-boundary flags + boundary atomics) is therefore realized at the XLA
level: global sort groups runs, XLA's scatter-add applies duplicates
in order — deterministic, which the reference's atomics are not
(``cuembed_test.py:33``). ``supported`` reports False so dispatch always
uses the faster path; revisit if Mosaic grows a descriptor-batched DMA
or vector gather primitive.
"""

from __future__ import annotations


def supported(grad_y, num_categories) -> bool:
    return False


def embedding_backward_pallas(*args, **kwargs):  # pragma: no cover
    raise NotImplementedError("pallas backward not yet implemented")
