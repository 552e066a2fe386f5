"""Bitwise parity grid — the reference's exact-equality discipline.

``test_embedding_against_cpu.cu:154-163`` gates unweighted paths on
BITWISE GPU==CPU equality. Floating-point summation order differs
between the sequential golden model and XLA's reductions, so this suite
makes the arithmetic order-insensitive the way the reference's datagen
does for gradients (integer U{-10,10}): tables hold small integers and
weights are {0.5, 0.25} — every product and partial sum is exactly
representable, so ANY summation order yields the same bits. Equality is
then asserted with ``assert_array_equal`` across the full mode grid and
all four type classes (fp32, fp16+fp32 accum, and the fp16/bf16
``low_precision_math`` classes the reference calls ``fp16_math=true``,
``test_embedding_against_cpu.cu:303-314``).

Together with tests/test_against_ref.py (random-real-valued, tight
allclose) this covers the reference's 57-config x 6-type-class
workhorse grid.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cuembed_tpu import CombineMode, embedding_forward_xla
from cuembed_tpu.ops.tiered import TieredConfig, tiered_forward
from cuembed_tpu.ref import embedding_forward_ref

# (batch, width, hotness) — mirrors the reference's shape spread
# (widths 2..514 incl. non-powers-of-2 36/514, odd batches).
SHAPES = [
    (3, 2, 4),
    (7, 4, 1),
    (31, 8, 8),
    (129, 32, 26),
    (129, 36, 26),
    (65, 64, 17),
    (33, 128, 33),
    (3, 512, 63),
    (17, 514, 5),
    (255, 16, 2),
]
MODES = ["sum", "sum_csr", "sum_w", "sum_csr_w", "mean", "mean_csr", "concat"]

# (storage dtype, low_precision_math, max abs table value) — value bound
# keeps every partial sum exact in the accumulation precision
# (fp16: |sum| <= 2048; bf16: <= 256).
TYPE_CLASSES = [
    (np.float32, False, 8),
    (np.float16, False, 8),
    (np.float16, True, 2),
    ("bfloat16", True, 1),
]


def _problem(rng, batch, width, hotness, mode, dtype, vmax):
    V = 200
    np_dt = np.float32 if dtype == "bfloat16" else np.dtype(dtype)
    table = rng.integers(-vmax, vmax + 1, (V, width)).astype(np_dt)
    if dtype == "bfloat16":
        table = jnp.asarray(table).astype(jnp.bfloat16)
    weights = None
    offsets = None
    if mode.endswith("_w"):
        mode = mode[:-2]
        weighted = True
    else:
        weighted = False
    csr = mode.endswith("_csr")
    if csr:
        mode = mode[:-4]
        hots = rng.integers(0, hotness + 1, batch)
        offsets = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
        nnz = int(offsets[-1])
        cap = nnz + int(rng.integers(0, 4))
        indices = rng.integers(0, V, max(cap, 1)).astype(np.int32)
        if weighted:
            weights = rng.choice([0.5, 0.25], max(cap, 1)).astype(np.float32)
    else:
        indices = rng.integers(0, V, (batch, hotness)).astype(np.int32)
        if weighted:
            weights = rng.choice([0.5, 0.25], (batch, hotness)).astype(
                np.float32
            )
    return table, indices, offsets, weights, CombineMode(mode)


@pytest.mark.parametrize("dtype,lpm,vmax", TYPE_CLASSES,
                         ids=["f32", "f16", "f16math", "bf16math"])
@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("shape_i", range(len(SHAPES)))
def test_forward_bitwise(shape_i, mode, dtype, lpm, vmax):
    batch, width, hotness = SHAPES[shape_i]
    if mode == "concat" and lpm:
        pytest.skip("concat never accumulates; covered by the f32/f16 rows")
    if dtype == "bfloat16" and mode.startswith("mean"):
        # numpy has no bf16: the f32 golden's reciprocal rounds
        # differently than bf16 arithmetic. The MEAN x bf16-math class
        # is covered by the f16math rows (same code path).
        pytest.skip("no numpy bf16 golden for the MEAN reciprocal")
    rng = np.random.default_rng(shape_i * 131 + len(mode))
    table, idx, offsets, w, m = _problem(
        rng, batch, width, hotness, mode, dtype, vmax
    )
    host_table = np.asarray(table, dtype=np.float32)
    ref = embedding_forward_ref(
        np.asarray(table) if dtype != "bfloat16" else host_table,
        idx, offsets=offsets, weights=w, mode=m,
        low_precision_math=lpm,
    ) if dtype != "bfloat16" else None
    if dtype == "bfloat16":
        # numpy has no bfloat16: run the golden in f32 — the integer
        # data is exact in bf16, and with |sums| <= 256 the bf16
        # accumulation of exact integers is also exact, so f32 golden
        # values equal the bf16 results bit-for-bit after cast.
        ref = embedding_forward_ref(
            host_table, idx, offsets=offsets, weights=w, mode=m,
        )
    got = embedding_forward_xla(
        jnp.asarray(table), jnp.asarray(idx),
        None if offsets is None else jnp.asarray(offsets),
        None if w is None else jnp.asarray(w),
        mode=m, low_precision_math=lpm,
    )
    got_f = np.asarray(got, dtype=np.float32)
    ref_f = np.asarray(ref, dtype=np.float32)
    np.testing.assert_array_equal(got_f, ref_f)


@pytest.mark.parametrize("mode", ["sum", "sum_csr", "mean"])
@pytest.mark.parametrize("shape_i", [1, 3, 7])
def test_forward_bitwise_int64_indices(shape_i, mode):
    """The int64 index surface (canonicalized through int32) is bitwise-
    identical to the int32 path — the reference instantiates a real
    64-bit kernel (``embedding_gpu_forward.cu:61-77``); here the policy
    is narrowing, verified exact."""
    from cuembed_tpu import embedding_lookup, embedding_lookup_csr

    batch, width, hotness = SHAPES[shape_i]
    rng = np.random.default_rng(900 + shape_i)
    table, idx, offsets, w, m = _problem(
        rng, batch, width, hotness, mode, np.float32, 8
    )
    args32 = (jnp.asarray(idx.astype(np.int32)),)
    args64 = (jnp.asarray(idx.astype(np.int64)),)
    if offsets is not None:
        a = embedding_lookup_csr(
            jnp.asarray(table), args32[0], jnp.asarray(offsets), mode=m)
        b = embedding_lookup_csr(
            jnp.asarray(table), args64[0], jnp.asarray(offsets), mode=m)
    else:
        a = embedding_lookup(jnp.asarray(table), args32[0], mode=m)
        b = embedding_lookup(jnp.asarray(table), args64[0], mode=m)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mode", ["sum", "mean", "sum_w"])
@pytest.mark.parametrize("shape_i", [2, 3, 6])
def test_tiered_forward_bitwise(shape_i, mode):
    """The tiered engine reassociates sums — with integer-exact data the
    result is still bitwise-identical to the golden model. MEAN folds
    the 1/hotness coefficient per position (a different rounding from
    the golden's sum-then-scale) unless hotness is a power of two."""
    batch, width, hotness = SHAPES[shape_i]
    if mode == "mean" and hotness & (hotness - 1):
        pytest.skip("per-position 1/hotness is exact only for pow2 hotness")
    rng = np.random.default_rng(777 + shape_i)
    table, idx, offsets, w, m = _problem(
        rng, batch, width, hotness, mode, np.float32, 8
    )
    ref = embedding_forward_ref(
        np.asarray(table), idx, offsets=offsets, weights=w, mode=m
    )
    e = hotness * max(1, 64 // hotness)
    cfg = TieredConfig(
        hot_rows=60, chunk_elems=e, cold_slots=min(e, 64),
        mxu_head_rows=16, mid_slots=min(e, 64),
    )
    got = tiered_forward(
        jnp.asarray(table), jnp.asarray(idx),
        None, None if w is None else jnp.asarray(w), mode=m, cfg=cfg,
    )
    np.testing.assert_array_equal(np.asarray(got), ref)
