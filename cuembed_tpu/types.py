"""Core types for the TPU-native embedding lookup engine.

This module is the TPU analog of the reference's type substrate
(``cuembed/include/embedding_lookup_types.cuh``): the ``CombineMode`` enum
(reference ``embedding_lookup_types.cuh:29``) and the accumulation-precision
policy that replaces ``VecTypeHelper`` (reference
``embedding_lookup_types.cuh:497-574``).

On TPU there is no need for hand-rolled vector structs (``float8``/``half8``)
or ``VecAtomicAdd``: the VPU operates on (8, 128) native tiles and the
backward pass is built on sorted segments rather than atomics, so the only
policy that survives from the reference is *which dtype to accumulate in*:
fp16/bf16 storage rows may be reduced in fp32 (the reference's
``fp16_math=false`` path) or in their native precision (``fp16_math=true``).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np


class CombineMode(enum.Enum):
    """How gathered embedding rows are combined per sample.

    Mirrors ``cuembed::CombineMode`` (reference
    ``embedding_lookup_types.cuh:29-34``):

    * ``SUM``    — (optionally weighted) sum of the sample's rows.
    * ``MEAN``   — unweighted mean; a zero-hotness sample produces zeros
      (TF-style mean semantics, reference ``embedding_lookup_ops.cuh:273-285``).
    * ``CONCAT`` — rows are emitted unreduced, one output row per lookup.
      Fixed-hotness only; weighted concat is not supported (reference
      ``embedding_lookup.cuh:261-267``).
    """

    SUM = "sum"
    MEAN = "mean"
    CONCAT = "concat"


# Dtypes supported for embedding-table storage.
STORAGE_DTYPES = (jnp.float32, jnp.bfloat16, jnp.float16)


def accumulation_dtype(storage_dtype, low_precision_math: bool = False):
    """Pick the reduction dtype for a given storage dtype.

    The TPU analog of ``VecTypeHelper``'s LoadType/ReduceType split
    (reference ``embedding_lookup_types.cuh:497-574``): half-precision rows
    reduce in fp32 unless the caller explicitly opts into native-precision
    math (the reference's ``fp16_math=true``).

    Args:
      storage_dtype: dtype the embedding rows are stored in.
      low_precision_math: if True, accumulate in the storage precision
        (only meaningful for fp16/bf16 storage).

    Returns:
      The jnp dtype to accumulate partial sums in.
    """
    storage_dtype = jnp.dtype(storage_dtype)
    if storage_dtype == jnp.float32:
        return jnp.float32
    if low_precision_math:
        return storage_dtype
    return jnp.float32


def canonical_index_dtype(indices, num_categories: Optional[int] = None):
    """Return the dtype lookups should run in for the given indices.

    The reference supports int32 and int64 index types end to end
    (explicit instantiations in ``utils/src/embedding_gpu_forward.cu:61-77``).
    TPUs are 32-bit-native, so int64 indices are routed through int32
    whenever the table is small enough for that to be lossless.
    """
    try:
        dt = np.dtype(indices)  # dtype-like (np.int32, "int64", jnp.int32)
    except TypeError:
        dt = np.dtype(indices.dtype)  # array-like
    if dt == np.int32:
        return jnp.int32
    if dt == np.int64:
        if num_categories is None or num_categories < 2**31:
            return jnp.int32
        return jnp.int64
    raise ValueError(f"unsupported index dtype: {dt}")


@dataclass(frozen=True)
class FixedFormat:
    """Fixed-hotness index layout: ``indices`` has shape ``[batch, hotness]``.

    The analog of the reference's ``hotness > 0 && offsets == nullptr`` calling
    convention (``embedding_lookup.cuh:261-267``).
    """

    hotness: int

    def __post_init__(self):
        if self.hotness <= 0:
            raise ValueError("fixed-hotness format requires hotness > 0")


@dataclass(frozen=True)
class CSRFormat:
    """CSR (variable-hotness) layout: flat ``indices[nnz]`` + ``offsets[batch+1]``.

    ``offsets[i]:offsets[i+1]`` delimits sample ``i``'s lookups. The analog of
    the reference's ``offsets != nullptr && hotness == 0`` convention.

    ``capacity`` is the static size of the (possibly padded) indices array;
    positions at or beyond ``offsets[-1]`` are padding and contribute nothing.
    Padding is how a fixed-shape (jit-stable) program absorbs the dynamic nnz
    that the reference handles with runtime-sized allocations.
    """

    capacity: int

    def __post_init__(self):
        if self.capacity < 0:
            raise ValueError("capacity must be >= 0")


def combine_coefficients(weights, mode, batch: int, hotness: int):
    """Flat ``[batch*hotness]`` f32 combine coefficients for pooled
    lookups: weights (SUM only) or ones, with MEAN's 1/hotness folded in.

    The shared helper behind every fixed-hotness pooled path that builds
    per-position coefficients explicitly (int8 serving, host offload);
    the main engine folds the same logic inside
    :func:`cuembed_tpu.train._flatten_coo`.
    """
    import jax.numpy as jnp

    if mode == CombineMode.CONCAT:
        raise ValueError("pooled combine; CONCAT has no coefficients")
    if weights is not None and mode != CombineMode.SUM:
        raise ValueError("weights are only supported with CombineMode.SUM")
    coeff = (
        weights.reshape(-1).astype(jnp.float32)
        if weights is not None
        else jnp.ones((batch * hotness,), jnp.float32)
    )
    if mode == CombineMode.MEAN:
        coeff = coeff / max(hotness, 1)
    return coeff
