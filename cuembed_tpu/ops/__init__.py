"""Device ops: index transforms, XLA-composed lookup, Pallas kernels,
and the differentiable public API."""

from cuembed_tpu.ops.transforms import (
    extract_row_ids_from_fixed,
    extract_row_ids_from_csr,
    extract_row_ids_for_concat,
    transpose,
    compute_compressed_grad_indices,
    compact_sparse_indices,
)
from cuembed_tpu.ops.lookup_xla import (
    embedding_forward_xla,
    embedding_backward_xla,
)
from cuembed_tpu.ops.api import embedding_lookup, embedding_lookup_csr
from cuembed_tpu.ops.tiered import TieredConfig, auto_config, tiered_forward

__all__ = [
    "TieredConfig",
    "auto_config",
    "tiered_forward",
    "extract_row_ids_from_fixed",
    "extract_row_ids_from_csr",
    "extract_row_ids_for_concat",
    "transpose",
    "compute_compressed_grad_indices",
    "compact_sparse_indices",
    "embedding_forward_xla",
    "embedding_backward_xla",
    "embedding_lookup",
    "embedding_lookup_csr",
]
