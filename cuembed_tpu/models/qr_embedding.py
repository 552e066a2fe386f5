"""Quotient-remainder compositional embeddings (``QREmbeddingBag``).

The standard memory-compression trick for huge vocabularies (Shi et
al., "Compositional Embeddings Using Complementary Partitions for
Memory-Efficient Recommendation Systems", KDD 2020; torchrec ships it
as ``QREmbeddingBag``): a ``[V, W]`` table is replaced by a quotient
table ``[ceil(V/Q), W]`` and a remainder table ``[Q, W]``, and id ``i``
is represented by ``op(q_table[i // Q], r_table[i % Q])``. The two
partitions are complementary — every id maps to a distinct
(quotient, remainder) pair — so distinct ids get distinct (though not
independent) vectors while memory drops from ``V*W`` to
``(ceil(V/Q) + Q) * W``.

The reference has no counterpart (single exact table,
``/root/reference/README.md:110``); this composes with it the same way
torchrec's does with ``nn.EmbeddingBag``. TPU mapping: both sub-lookups
ride the full engine (tiered hot/cold, packed narrow, any backend).

* ``operation="add"`` — pooling is linear, so SUM / MEAN / weighted-SUM
  decompose: ``pool(q_i + r_i) = pool(q_i) + pool(r_i)``. Two POOLED
  lookups and one add; no per-id row is ever materialized. CSR works.
* ``operation="mult"`` — needs per-id rows: two CONCAT lookups, an
  elementwise product, then the pooled combine. Fixed-hotness only
  (CSR+CONCAT is unsupported, matching the reference's constraint,
  ``embedding_lookup.cuh:261-267``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from cuembed_tpu.ops.api import embedding_lookup, embedding_lookup_csr
from cuembed_tpu.types import CombineMode


@dataclass(frozen=True)
class QREmbeddingBag:
    """Configuration + init/apply for one quotient-remainder table pair."""

    num_categories: int
    width: int
    num_buckets: int                    # Q: remainder-table rows
    operation: str = "add"              # "add" | "mult"
    mode: CombineMode = CombineMode.SUM
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        if self.num_buckets < 1:
            raise ValueError("num_buckets must be >= 1")
        if self.num_buckets > self.num_categories:
            raise ValueError(
                f"num_buckets ({self.num_buckets}) > num_categories "
                f"({self.num_categories}): the remainder table alone "
                "would outgrow the exact table QR exists to compress — "
                "pick Q ~ sqrt(num_categories)"
            )
        if self.operation not in ("add", "mult"):
            raise ValueError("operation must be 'add' or 'mult'")
        if self.mode == CombineMode.CONCAT:
            raise ValueError(
                "QR composes per id; CONCAT pooling would return per-id "
                "rows — compose manually from two CONCAT lookups"
            )

    @property
    def num_quotients(self) -> int:
        return -(-self.num_categories // self.num_buckets)

    def init(self, key: jax.Array) -> dict:
        """{"q": [ceil(V/Q), W], "r": [Q, W]} — U(-1, 1) like the
        reference's table init (``embedding_allocation.cu:113-116``)."""
        kq, kr = jax.random.split(key)
        q = jax.random.uniform(
            kq, (self.num_quotients, self.width), self.dtype, -1.0, 1.0
        )
        # "mult" composes multiplicatively: center the remainder factors
        # at 1 so an untrained pair starts near the quotient vector.
        if self.operation == "mult":
            r = 1.0 + 0.1 * jax.random.uniform(
                kr, (self.num_buckets, self.width), self.dtype, -1.0, 1.0
            )
        else:
            r = jax.random.uniform(
                kr, (self.num_buckets, self.width), self.dtype, -1.0, 1.0
            )
        return {"q": q, "r": r.astype(self.dtype)}

    def apply(
        self,
        params: dict,
        indices: jax.Array,
        weights: Optional[jax.Array] = None,
        offsets: Optional[jax.Array] = None,
        *,
        backend: str = "auto",
    ) -> jax.Array:
        """Pooled ``[batch, width]`` lookup through both partitions."""
        q, r = params["q"], params["r"]
        qidx = indices // self.num_buckets
        ridx = indices % self.num_buckets
        if self.operation == "add":
            if offsets is not None:
                out_q = embedding_lookup_csr(
                    q, qidx, offsets, weights, mode=self.mode,
                    backend=backend,
                )
                out_r = embedding_lookup_csr(
                    r, ridx, offsets, weights, mode=self.mode,
                    backend=backend,
                )
            else:
                out_q = embedding_lookup(
                    q, qidx, weights, mode=self.mode, backend=backend
                )
                out_r = embedding_lookup(
                    r, ridx, weights, mode=self.mode, backend=backend
                )
            return out_q + out_r

        # operation == "mult": per-id rows via CONCAT, then pool.
        if offsets is not None:
            raise ValueError(
                "operation='mult' is fixed-hotness only (per-id rows "
                "come from CONCAT lookups; CSR+CONCAT is unsupported)"
            )
        batch, hot = indices.shape
        rows_q = embedding_lookup(
            q, qidx, mode=CombineMode.CONCAT, backend=backend
        )
        rows_r = embedding_lookup(
            r, ridx, mode=CombineMode.CONCAT, backend=backend
        )
        rows = (rows_q * rows_r).reshape(batch, hot, self.width)
        if weights is not None:
            if self.mode != CombineMode.SUM:
                raise ValueError(
                    "weights are only supported with CombineMode.SUM"
                )
            return jnp.sum(rows * weights[:, :, None], axis=1)
        pooled = jnp.sum(rows, axis=1)
        if self.mode == CombineMode.MEAN:
            pooled = pooled / hot
        return pooled
