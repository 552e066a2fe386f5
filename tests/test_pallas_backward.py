"""Pallas sorted-COO backward kernel vs the XLA path (interpret mode).

The kernel's contract mirrors ``embedding_backward_xla``; grad_y values
are integer-valued so fp32 accumulation is exact and comparisons are
bitwise (reference discipline, ``test_embedding_against_cpu.cu:154``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cuembed_tpu.ops.lookup_xla import embedding_backward_xla
from cuembed_tpu.ops.pallas_backward import (
    embedding_backward_pallas,
    supported,
)

SENT = np.iinfo(np.int32).max


def _coo(rng, batch, hotness, V, n_pad=0):
    idx = rng.integers(0, V, batch * hotness).astype(np.int32)
    sid = (np.arange(batch * hotness, dtype=np.int32) // hotness)
    order = np.argsort(idx, kind="stable")
    t_idx, t_sid = idx[order], sid[order]
    if n_pad:
        t_idx = np.concatenate([t_idx, np.full(n_pad, SENT, np.int32)])
        t_sid = np.concatenate([t_sid, np.zeros(n_pad, np.int32)])
    return t_idx, t_sid


@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("batch,hotness,V,W", [
    (32, 8, 200, 128),
    (13, 5, 67, 256),
    (64, 3, 40, 128),   # heavy duplication (long runs)
])
def test_pallas_backward_matches_xla(batch, hotness, V, W, weighted):
    rng = np.random.default_rng(batch + W)
    t_idx, t_sid = _coo(rng, batch, hotness, V, n_pad=7)
    gy = rng.integers(-10, 11, (batch, W)).astype(np.float32)
    t_w = (
        rng.choice([0.5, 0.25, 1.0], t_idx.shape[0]).astype(np.float32)
        if weighted else None
    )
    assert supported(jnp.asarray(gy), V)

    ref = embedding_backward_xla(
        jnp.asarray(gy), V, jnp.asarray(t_idx), jnp.asarray(t_sid),
        None if t_w is None else jnp.asarray(t_w),
    )
    got = embedding_backward_pallas(
        jnp.asarray(gy), V, jnp.asarray(t_idx), jnp.asarray(t_sid),
        None if t_w is None else jnp.asarray(t_w),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_backward_initial_grad_and_nnz():
    rng = np.random.default_rng(0)
    V, W, batch, hotness = 100, 128, 16, 4
    t_idx, t_sid = _coo(rng, batch, hotness, V)
    gy = rng.integers(-5, 6, (batch, W)).astype(np.float32)
    init = rng.integers(-3, 4, (V, W)).astype(np.float32)
    nnz = jnp.int32(t_idx.shape[0] - 10)

    ref = embedding_backward_xla(
        jnp.asarray(gy), V, jnp.asarray(t_idx), jnp.asarray(t_sid),
        None, nnz=nnz, initial_grad=jnp.asarray(init),
    )
    got = embedding_backward_pallas(
        jnp.asarray(gy), V, jnp.asarray(t_idx), jnp.asarray(t_sid),
        None, nnz=nnz, initial_grad=jnp.asarray(init), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
