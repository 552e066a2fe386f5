"""cuembed_tpu — a TPU-native embedding-lookup engine.

A from-scratch JAX/Pallas framework with the full capability surface of the
reference CUDA library (NVIDIA/cuEmbed): forward embedding-bag lookup
(fixed-hotness and CSR, sum/mean/weighted-sum/concat, fp32/bf16/fp16 with
an fp32-accumulation policy), deterministic sort-based COO backward with
full and compressed gradients, index transforms, synthetic-workload
generation, a benchmark harness — plus a multi-chip sharding layer
(row/column table sharding over a ``jax.sharding.Mesh`` with all-to-all
index routing) that the reference lists only as future work.
"""

from cuembed_tpu.types import CombineMode, CSRFormat, FixedFormat, accumulation_dtype
from cuembed_tpu.ops.api import embedding_lookup, embedding_lookup_csr
from cuembed_tpu.ops.lookup_xla import (
    CompressedGrad,
    embedding_backward_compressed_xla,
    embedding_backward_xla,
    embedding_forward_xla,
)
from cuembed_tpu.ops.tiered import (
    TieredConfig,
    csr_combine_config,
    tiered_forward,
)
from cuembed_tpu.table import EmbeddingTable, resize_table
from cuembed_tpu.collection import EmbeddingCollection, TableConfig
from cuembed_tpu.offload import HostOffloadTable, OffloadBatch
from cuembed_tpu.fused import (
    FusedSpec,
    fuse_counts,
    fuse_tables,
    fused_adagrad_update,
    fused_lookup,
    fused_sgd_update,
    fused_sharded_adagrad_update,
    fused_sharded_lookup,
    fused_sharded_sgd_update,
    unfuse_table,
)
from cuembed_tpu.train import (
    adam_init,
    adam_sparse_update,
    rowwise_adagrad_init,
    rowwise_adagrad_sparse_update,
    sgd_sparse_update,
)
from cuembed_tpu.ops.transforms import (
    compact_sparse_indices,
    compute_compressed_grad_indices,
    extract_row_ids_for_concat,
    extract_row_ids_from_csr,
    extract_row_ids_from_fixed,
    transpose,
    transpose_masked_compact,
)

__version__ = "0.1.0"

__all__ = [
    "CombineMode",
    "FixedFormat",
    "CSRFormat",
    "accumulation_dtype",
    "embedding_lookup",
    "embedding_lookup_csr",
    "TieredConfig",
    "csr_combine_config",
    "tiered_forward",
    "EmbeddingTable",
    "resize_table",
    "EmbeddingCollection",
    "TableConfig",
    "HostOffloadTable",
    "OffloadBatch",
    "FusedSpec",
    "fuse_tables",
    "fuse_counts",
    "fused_lookup",
    "fused_sgd_update",
    "fused_adagrad_update",
    "fused_sharded_lookup",
    "fused_sharded_sgd_update",
    "fused_sharded_adagrad_update",
    "unfuse_table",
    "sgd_sparse_update",
    "rowwise_adagrad_init",
    "adam_init",
    "adam_sparse_update",
    "rowwise_adagrad_sparse_update",
    "embedding_forward_xla",
    "embedding_backward_xla",
    "embedding_backward_compressed_xla",
    "CompressedGrad",
    "transpose",
    "transpose_masked_compact",
    "extract_row_ids_from_fixed",
    "extract_row_ids_from_csr",
    "extract_row_ids_for_concat",
    "compute_compressed_grad_indices",
    "compact_sparse_indices",
]
