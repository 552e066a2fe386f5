"""Tiered backward (MXU head + capacity-bounded scatter) vs plain paths.

The compressed output is canonical (unique indices ascending + their
summed rows), so the tiered variant must agree with
``embedding_backward_compressed_xla`` on the unmasked COO — bitwise on
integer-valued data (any f32 summation order is exact), allclose on
random data (the head matmul reassociates the per-run sums).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cuembed_tpu.ops.head import tiered_backward_coo
from cuembed_tpu.ops.lookup_xla import (
    embedding_backward_compressed_tiered,
    embedding_backward_compressed_xla,
    embedding_backward_xla,
)
from cuembed_tpu.ops.tiered import TieredConfig

SENT = np.iinfo(np.int32).max


def _problem(rng, batch, hotness, num_categories, head, integer=True):
    idx = rng.integers(0, num_categories, (batch, hotness)).astype(np.int32)
    # concentrate traffic on the head to mimic power-law
    hot_mask = rng.random((batch, hotness)) < 0.5
    idx = np.where(hot_mask, rng.integers(0, head, (batch, hotness)), idx)
    if integer:
        gy = rng.integers(-5, 6, (batch, 8)).astype(np.float32)
        coeff = rng.integers(1, 4, (batch, hotness)).astype(np.float32)
    else:
        gy = rng.standard_normal((batch, 8)).astype(np.float32)
        coeff = rng.standard_normal((batch, hotness)).astype(np.float32)
    return idx, gy, coeff


def _coo(idx, coeff, head=None):
    n = idx.size
    flat = idx.reshape(-1)
    if head is not None:
        flat = np.where(flat < head, SENT, flat)
    order = np.argsort(flat, kind="stable")
    sid = (np.arange(n, dtype=np.int32) // idx.shape[1])[order]
    return (
        jnp.asarray(flat[order].astype(np.int32)),
        jnp.asarray(sid),
        jnp.asarray(coeff.reshape(-1)[order]),
    )


@pytest.mark.parametrize("integer", [True, False])
@pytest.mark.parametrize("slack", [1.0, 0.25])
def test_compressed_tiered_matches_plain(integer, slack):
    rng = np.random.default_rng(0 if integer else 1)
    V, B, H, HEAD = 500, 64, 8, 16
    # chunk/slot config only sets the non-head capacity here; slack=0.25
    # forces the overflow fallback branch.
    cfg = TieredConfig(
        hot_rows=100, chunk_elems=64,
        cold_slots=max(4, int(64 * slack * 0.5)),
        mxu_head_rows=HEAD, mid_slots=max(4, int(64 * slack * 0.5)),
    )
    idx, gy, coeff = _problem(rng, B, H, V, HEAD, integer)

    t_plain = _coo(idx, coeff)
    ref = embedding_backward_compressed_xla(
        jnp.asarray(gy), *t_plain
    )
    t_masked = _coo(idx, coeff, head=HEAD)
    out = embedding_backward_compressed_tiered(
        jnp.asarray(gy), V, jnp.asarray(idx), jnp.asarray(coeff),
        *t_masked, cfg,
    )

    nu = int(ref.num_unique)
    assert int(out.num_unique) == nu
    np.testing.assert_array_equal(
        np.asarray(out.unique_indices)[:nu],
        np.asarray(ref.unique_indices)[:nu],
    )
    r_ref = np.asarray(ref.rows)[:nu]
    r_out = np.asarray(out.rows)[:nu]
    if integer:
        np.testing.assert_array_equal(r_out, r_ref)
    else:
        np.testing.assert_allclose(r_out, r_ref, rtol=2e-5, atol=2e-5)
    # padding discipline: indices past num_unique are sentinel, rows zero
    assert (np.asarray(out.unique_indices)[nu:] == SENT).all()
    np.testing.assert_array_equal(np.asarray(out.rows)[nu:], 0.0)


@pytest.mark.parametrize("integer", [True, False])
@pytest.mark.parametrize("seg_slots,run_frac", [(64, 0.5), (8, 0.5)])
def test_compressed_tiered_mxu_segment(integer, seg_slots, run_frac):
    """The per-chunk one-hot segment-reduce path (and its overflow cond:
    seg_slots=8 is intentionally undersized to force the fallback)."""
    rng = np.random.default_rng(10 if integer else 11)
    V, B, H, HEAD = 500, 64, 8, 16
    cfg = TieredConfig(
        hot_rows=100, chunk_elems=64, cold_slots=32,
        mxu_head_rows=HEAD, mid_slots=32,
        bwd_seg_chunk=32, bwd_seg_slots=seg_slots, bwd_run_frac=run_frac,
    )
    idx, gy, coeff = _problem(rng, B, H, V, HEAD, integer)
    # push traffic into the mid range so the run-heavy prefix is real
    mid_mask = rng.random((B, H)) < 0.5
    idx = np.where(
        mid_mask, rng.integers(HEAD, 100, (B, H)), idx
    ).astype(np.int32)

    ref = embedding_backward_compressed_xla(
        jnp.asarray(gy), *_coo(idx, coeff)
    )
    out = embedding_backward_compressed_tiered(
        jnp.asarray(gy), V, jnp.asarray(idx), jnp.asarray(coeff),
        *_coo(idx, coeff, head=HEAD), cfg,
    )
    nu = int(ref.num_unique)
    assert int(out.num_unique) == nu
    np.testing.assert_array_equal(
        np.asarray(out.unique_indices)[:nu],
        np.asarray(ref.unique_indices)[:nu],
    )
    r_ref, r_out = np.asarray(ref.rows)[:nu], np.asarray(out.rows)[:nu]
    if integer:
        np.testing.assert_array_equal(r_out, r_ref)
    else:
        np.testing.assert_allclose(r_out, r_ref, rtol=2e-5, atol=2e-5)


def test_full_tiered_matches_plain():
    rng = np.random.default_rng(2)
    V, B, H, HEAD = 300, 48, 4, 8
    cfg = TieredConfig(hot_rows=64, chunk_elems=32, cold_slots=16,
                       mxu_head_rows=HEAD, mid_slots=16)
    idx, gy, coeff = _problem(rng, B, H, V, HEAD, integer=True)

    t_plain = _coo(idx, coeff)
    ref = embedding_backward_xla(jnp.asarray(gy), V, *t_plain)
    t_masked = _coo(idx, coeff, head=HEAD)
    out = tiered_backward_coo(
        jnp.asarray(gy), V, jnp.asarray(idx), jnp.asarray(coeff),
        *t_masked, cfg,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_compressed_tiered_no_head_traffic():
    """No lookup ever touches the head: head block contributes nothing."""
    rng = np.random.default_rng(3)
    V, B, H, HEAD = 200, 16, 4, 8
    cfg = TieredConfig(hot_rows=64, chunk_elems=16, cold_slots=16,
                       mxu_head_rows=HEAD, mid_slots=16)
    idx = rng.integers(HEAD, V, (B, H)).astype(np.int32)
    gy = rng.integers(-3, 4, (B, 4)).astype(np.float32)
    coeff = np.ones((B, H), np.float32)

    ref = embedding_backward_compressed_xla(jnp.asarray(gy), *_coo(idx, coeff))
    out = embedding_backward_compressed_tiered(
        jnp.asarray(gy), V, jnp.asarray(idx), jnp.asarray(coeff),
        *_coo(idx, coeff, head=HEAD), cfg,
    )
    nu = int(ref.num_unique)
    assert int(out.num_unique) == nu
    np.testing.assert_array_equal(
        np.asarray(out.unique_indices)[:nu],
        np.asarray(ref.unique_indices)[:nu],
    )
    np.testing.assert_array_equal(
        np.asarray(out.rows)[:nu], np.asarray(ref.rows)[:nu]
    )
