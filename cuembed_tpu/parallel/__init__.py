"""Multi-chip sharding layer (beyond the reference's single-GPU scope).

The reference defers multi-table/multi-device to "Future Release"
(``README.md:110``); this package is the TPU-native design for that gap:
tables sharded over a ``jax.sharding.Mesh`` (row-wise or column-wise),
lookups routed with masked local gathers + ``psum`` or all-to-all index
exchange over ICI, and the dense consumer data-parallel.
"""

from cuembed_tpu.parallel.sharding import (
    make_mesh,
    table_sharding,
    batch_sharding,
    pad_table_for_shards,
    shard_csr,
)
from cuembed_tpu.parallel.sharded_lookup import (
    row_sharded_lookup,
    column_sharded_lookup,
)
from cuembed_tpu.parallel.alltoall_lookup import (
    alltoall_row_sharded_lookup,
    grid_sharded_lookup,
    hybrid_tiered_lookup,
    split_hybrid_table,
)
from cuembed_tpu.parallel.train import (
    grid_sharded_sgd_sparse_update,
    grid_sharded_rowwise_adagrad_sparse_update,
    sharded_sgd_sparse_update,
    sharded_rowwise_adagrad_sparse_update,
    sharded_hybrid_sgd_sparse_update,
    sharded_hybrid_rowwise_adagrad_sparse_update,
    column_sharded_sgd_sparse_update,
    column_sharded_rowwise_adagrad_sparse_update,
)
from cuembed_tpu.parallel.planner import (
    CostModel,
    Plan,
    PlanError,
    TablePlan,
    apply_plan,
    plan,
    planned_adagrad_init,
    planned_adagrad_update,
    planned_lookup,
    planned_sgd_update,
)
from cuembed_tpu.parallel import multihost

__all__ = [
    "CostModel",
    "Plan",
    "PlanError",
    "TablePlan",
    "apply_plan",
    "plan",
    "planned_adagrad_init",
    "planned_adagrad_update",
    "planned_lookup",
    "planned_sgd_update",
    "alltoall_row_sharded_lookup",
    "grid_sharded_lookup",
    "grid_sharded_sgd_sparse_update",
    "grid_sharded_rowwise_adagrad_sparse_update",
    "hybrid_tiered_lookup",
    "split_hybrid_table",
    "sharded_sgd_sparse_update",
    "sharded_rowwise_adagrad_sparse_update",
    "sharded_hybrid_sgd_sparse_update",
    "sharded_hybrid_rowwise_adagrad_sparse_update",
    "column_sharded_sgd_sparse_update",
    "column_sharded_rowwise_adagrad_sparse_update",
    "multihost",
    "make_mesh",
    "table_sharding",
    "batch_sharding",
    "pad_table_for_shards",
    "row_sharded_lookup",
    "shard_csr",
    "column_sharded_lookup",
]
