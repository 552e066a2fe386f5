"""EmbeddingBag: the ``nn.EmbeddingBag`` analog, Pallas/XLA-backed.

Functional module (pure pytree params) so it composes with any JAX
training loop. Mirrors the reference PyTorch wrapper's role
(``examples/pytorch/cuembed_pyt.py:37-51``).

Narrow widths (< 128 lanes) need a storage decision on TPU:
``layout="padded"`` (default) pads columns to a 128-lane multiple —
full gather rate, memory cost; ``layout="packed"`` line-packs 128/W
rows per lane line — memory-neutral, ~2.9x over the naive narrow gather
(:mod:`cuembed_tpu.ops.narrow`); ``layout="raw"`` stores as-is.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from cuembed_tpu.ops.api import embedding_lookup, embedding_lookup_csr
from cuembed_tpu.ops.narrow import (
    narrow_lookup,
    pack_narrow,
    packing_factor,
    unpack_narrow,
)
from cuembed_tpu.types import CombineMode

LANES = 128


def _torch_to_numpy(tensor):
    """Torch tensor → (numpy array, matching jnp dtype).

    bf16 tensors cannot ``.numpy()`` directly; round-trip through fp32
    (exact — every bf16 value is an fp32 value) and report bfloat16 so
    the imported table keeps its storage dtype.
    """
    t = tensor.detach().cpu()
    if str(t.dtype) == "torch.bfloat16":
        return t.float().numpy(), jnp.bfloat16
    w = t.numpy()
    return w, w.dtype


def _pad_width(width: int) -> int:
    return (width + LANES - 1) // LANES * LANES


@dataclass(frozen=True)
class EmbeddingBag:
    """Configuration + init/apply for one embedding-bag table."""

    num_categories: int
    width: int
    mode: CombineMode = CombineMode.SUM
    dtype: jnp.dtype = jnp.float32
    layout: str = "padded"  # "padded" | "packed" | "raw"

    def __post_init__(self):
        if self.layout not in ("padded", "packed", "raw"):
            raise ValueError(f"unknown layout: {self.layout}")

    @property
    def _packed(self) -> bool:
        return self.layout == "packed" and packing_factor(self.width) > 1

    @property
    def stored_width(self) -> int:
        if self.layout == "padded":
            return _pad_width(self.width)
        return self.width

    def _to_stored(self, table: jax.Array) -> jax.Array:
        """Logical ``[V, W]`` table → the configured storage layout."""
        if self._packed:
            return pack_narrow(table)
        if self.stored_width != self.width:
            table = jnp.pad(
                table, ((0, 0), (0, self.stored_width - self.width))
            )
        return table

    def init(self, key: jax.Array) -> jax.Array:
        """U(-1/sqrt(w), 1/sqrt(w)) init; padding columns/rows are zero."""
        scale = 1.0 / (self.width**0.5)
        table = jax.random.uniform(
            key,
            (self.num_categories, self.width),
            minval=-scale,
            maxval=scale,
            dtype=jnp.float32,
        ).astype(self.dtype)
        return self._to_stored(table)

    # -- torch interop (the migration path for reference users) ---------
    @classmethod
    def from_torch(cls, module, *, layout: str = "padded", dtype=None):
        """Build ``(EmbeddingBag, table)`` from a ``torch.nn.EmbeddingBag``
        (or ``nn.Embedding``) module.

        The reference's PyTorch extension swaps in for ``nn.EmbeddingBag``
        (``examples/pytorch/cuembed_test.py``); this is the same move in
        the other direction — weights and combine mode are taken from the
        torch module, relayout (pad/pack) happens once here.
        """
        w, torch_dtype = _torch_to_numpy(module.weight)
        mode_str = getattr(module, "mode", "sum")  # nn.Embedding: sum
        try:
            mode = {
                "sum": CombineMode.SUM, "mean": CombineMode.MEAN,
            }[mode_str]
        except KeyError:
            raise ValueError(
                f"torch mode {mode_str!r} has no CombineMode analog "
                "(max-pooling is out of the reference's scope too)"
            ) from None
        bag = cls(
            w.shape[0], w.shape[1], mode=mode,
            dtype=(
                jnp.dtype(dtype) if dtype is not None else torch_dtype
            ),
            layout=layout,
        )
        return bag, bag.import_table(w)

    def import_table(self, weight) -> jax.Array:
        """Logical ``[V, W]`` weights (numpy/torch) → stored layout."""
        import numpy as np

        if hasattr(weight, "detach"):
            weight, _ = _torch_to_numpy(weight)
        w = np.asarray(weight)
        if w.shape != (self.num_categories, self.width):
            raise ValueError(
                f"expected [{self.num_categories}, {self.width}] weights, "
                f"got {w.shape}"
            )
        return self._to_stored(jnp.asarray(w).astype(self.dtype))

    def export_table(self, table: jax.Array):
        """Stored layout → logical ``[V, W]`` numpy array (torch export:
        ``module.weight.data.copy_(torch.from_numpy(arr))``)."""
        import numpy as np

        if self._packed:
            table = unpack_narrow(table, self.num_categories, self.width)
        return np.asarray(table)[: self.num_categories, : self.width]

    def apply(
        self,
        table: jax.Array,
        indices: jax.Array,
        weights: Optional[jax.Array] = None,
        offsets: Optional[jax.Array] = None,
        *,
        backend: str = "auto",
        tiered_cfg=None,
    ) -> jax.Array:
        if self._packed:
            from cuembed_tpu.ops.tiered import tiering_profitable

            # auto = fastest: the packed gather beats line-tiering outside
            # the measured profitable batch-shape region
            # (tiered.tiering_profitable); backend="tiered" forces it.
            if (
                backend == "auto"
                and tiered_cfg is not None
                and offsets is None
                and indices.ndim == 2
                and not tiering_profitable(indices.size, indices.shape[1])
            ):
                tiered_cfg = None
            return narrow_lookup(
                table, self.num_categories, self.width, indices,
                weights, offsets, mode=self.mode, tiered_cfg=tiered_cfg,
            )
        if offsets is not None:
            out = embedding_lookup_csr(
                table, indices, offsets, weights, mode=self.mode,
                backend=backend, tiered_cfg=tiered_cfg,
            )
        else:
            out = embedding_lookup(
                table, indices, weights, mode=self.mode, backend=backend,
                tiered_cfg=tiered_cfg,
            )
        if self.stored_width != self.width:
            out = out[:, : self.width]
        return out
