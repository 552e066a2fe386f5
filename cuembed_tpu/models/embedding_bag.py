"""EmbeddingBag: the ``nn.EmbeddingBag`` analog, Pallas/XLA-backed.

Functional module (pure pytree params) so it composes with any JAX
training loop. Internally the table is stored padded to a 128-lane
multiple so the Pallas kernel is always eligible; the logical width is
sliced back on output. Mirrors the reference PyTorch wrapper's role
(``examples/pytorch/cuembed_pyt.py:37-51``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from cuembed_tpu.ops.api import embedding_lookup, embedding_lookup_csr
from cuembed_tpu.types import CombineMode

LANES = 128


def _pad_width(width: int) -> int:
    return (width + LANES - 1) // LANES * LANES


@dataclass(frozen=True)
class EmbeddingBag:
    """Configuration + init/apply for one embedding-bag table."""

    num_categories: int
    width: int
    mode: CombineMode = CombineMode.SUM
    dtype: jnp.dtype = jnp.float32
    pad_to_lanes: bool = True

    @property
    def stored_width(self) -> int:
        return _pad_width(self.width) if self.pad_to_lanes else self.width

    def init(self, key: jax.Array) -> jax.Array:
        """U(-1/sqrt(w), 1/sqrt(w)) init; padded columns are zero."""
        scale = 1.0 / (self.width**0.5)
        table = jax.random.uniform(
            key,
            (self.num_categories, self.width),
            minval=-scale,
            maxval=scale,
            dtype=jnp.float32,
        ).astype(self.dtype)
        if self.stored_width != self.width:
            table = jnp.pad(table, ((0, 0), (0, self.stored_width - self.width)))
        return table

    def apply(
        self,
        table: jax.Array,
        indices: jax.Array,
        weights: Optional[jax.Array] = None,
        offsets: Optional[jax.Array] = None,
        *,
        backend: str = "auto",
    ) -> jax.Array:
        if offsets is not None:
            out = embedding_lookup_csr(
                table, indices, offsets, weights, mode=self.mode, backend=backend
            )
        else:
            out = embedding_lookup(
                table, indices, weights, mode=self.mode, backend=backend
            )
        if self.stored_width != self.width:
            out = out[:, : self.width]
        return out
