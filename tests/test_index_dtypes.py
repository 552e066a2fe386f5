"""int64 index surface + skip_grad_init (initial_grad) parity tests.

The reference instantiates {int32, int64} x {fixed, CSR} end to end
(``embedding_gpu_forward.cu:61-77``); on TPU int64 routes through int32
whenever the vocabulary allows (``types.canonical_index_dtype``).
"""

import numpy as np

import jax.numpy as jnp

from cuembed_tpu import CombineMode, embedding_lookup, embedding_lookup_csr
from cuembed_tpu.ops.lookup_xla import embedding_backward_xla
from cuembed_tpu.ops.transforms import transpose
from cuembed_tpu.ref.forward import embedding_forward_ref
from cuembed_tpu.types import canonical_index_dtype


def test_canonical_index_dtype():
    assert canonical_index_dtype(np.int32) == jnp.int32
    assert canonical_index_dtype(np.int64) == jnp.int32
    assert canonical_index_dtype(np.int64, 2**31 - 1) == jnp.int32
    assert canonical_index_dtype(np.int64, 2**31 + 1) == jnp.int64


def test_int64_fixed_lookup_matches_int32():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((500, 16)).astype(np.float32))
    idx32 = rng.integers(0, 500, (16, 4)).astype(np.int32)
    out64 = embedding_lookup(table, idx32.astype(np.int64), backend="xla")
    out32 = embedding_lookup(table, jnp.asarray(idx32), backend="xla")
    np.testing.assert_array_equal(np.asarray(out64), np.asarray(out32))


def test_int64_csr_lookup_matches_golden():
    rng = np.random.default_rng(1)
    table = rng.standard_normal((300, 8)).astype(np.float32)
    offsets = np.array([0, 2, 2, 7], np.int64)
    flat = rng.integers(0, 300, 7).astype(np.int64)
    out = embedding_lookup_csr(
        jnp.asarray(table), flat, offsets.astype(np.int32),
        mode=CombineMode.MEAN, backend="xla",
    )
    ref = embedding_forward_ref(
        table, flat.astype(np.int32), offsets=offsets.astype(np.int32),
        mode=CombineMode.MEAN,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_initial_grad_accumulates():
    """initial_grad is the functional skip_grad_init: backward adds into
    a caller-owned buffer (reference embedding_lookup.cuh:455-461)."""
    rng = np.random.default_rng(2)
    V, W = 50, 8
    grad_y = jnp.asarray(rng.standard_normal((6, W)).astype(np.float32))
    idx = jnp.asarray(np.array([3, 3, 10, 20, 20, 20], np.int32))
    sid = jnp.asarray(np.arange(6, dtype=np.int32))
    t_idx, t_sid, _ = transpose(sid, idx, None)
    base = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))

    fresh = embedding_backward_xla(grad_y, V, t_idx, t_sid)
    accum = embedding_backward_xla(grad_y, V, t_idx, t_sid, initial_grad=base)
    np.testing.assert_allclose(
        np.asarray(accum), np.asarray(base) + np.asarray(fresh),
        rtol=1e-6, atol=1e-6,
    )


def test_backward_raises_for_ge_2pow31_rows():
    """Silently narrowing genuine int64 ids in the backward would wrap
    them negative and corrupt the gradient — it must raise instead.
    The guard is checked directly on shape structs (a real >=2**31-row
    table cannot be allocated, and x64-off JAX cannot even parse the
    row count as an int32 argument)."""
    import jax
    import pytest

    from cuembed_tpu.ops.api import _lookup_bwd

    table = jax.ShapeDtypeStruct((2**31 + 8, 8), jnp.float32)
    with pytest.raises(NotImplementedError, match="2\\*\\*31"):
        _lookup_bwd(None, (table, None, None, None), None)
