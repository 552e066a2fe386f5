"""Line-packed narrow-table tests: parity vs golden, grads, EmbeddingBag."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cuembed_tpu import CombineMode, embedding_lookup
from cuembed_tpu.models.embedding_bag import EmbeddingBag
from cuembed_tpu.ops.narrow import (
    narrow_lookup,
    pack_narrow,
    packing_factor,
    unpack_narrow,
)
from cuembed_tpu.ref.forward import embedding_forward_ref


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    for v, w in ((100, 32), (101, 16), (7, 64), (50, 128), (10, 48)):
        t = jnp.asarray(rng.standard_normal((v, w)).astype(np.float32))
        packed = pack_narrow(t)
        back = unpack_narrow(packed, v, w)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(t))
        k = packing_factor(w)
        assert packed.shape == ((v + k - 1) // k, k * w) if k > 1 else (v, w)


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN,
                                  CombineMode.CONCAT])
@pytest.mark.parametrize("width", [16, 32, 64])
def test_narrow_lookup_matches_golden(mode, width):
    rng = np.random.default_rng(1)
    V, B, H = 333, 24, 6
    table = rng.standard_normal((V, width)).astype(np.float32)
    idx = rng.integers(0, V, (B, H)).astype(np.int32)
    ref = embedding_forward_ref(table, idx, mode=mode)
    got = narrow_lookup(
        pack_narrow(jnp.asarray(table)), V, width, jnp.asarray(idx), mode=mode
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-6)


def test_narrow_lookup_csr_weighted():
    rng = np.random.default_rng(2)
    V, width, B = 200, 32, 16
    table = rng.standard_normal((V, width)).astype(np.float32)
    hots = rng.integers(0, 5, B)
    offsets = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    cap = int(offsets[-1]) + 3
    flat = rng.integers(0, V, cap).astype(np.int32)
    w = rng.standard_normal(cap).astype(np.float32)
    ref = embedding_forward_ref(
        table, flat[: int(offsets[-1])], offsets=offsets,
        weights=w[: int(offsets[-1])], mode=CombineMode.SUM,
    )
    got = narrow_lookup(
        pack_narrow(jnp.asarray(table)), V, width,
        jnp.asarray(flat), jnp.asarray(w), jnp.asarray(offsets),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-6)


def test_narrow_grad_matches_unpacked():
    rng = np.random.default_rng(3)
    V, width, B, H = 150, 32, 12, 4
    table = jnp.asarray(rng.standard_normal((V, width)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    gy = jnp.asarray(rng.standard_normal((B, width)).astype(np.float32))

    def loss_packed(p):
        return jnp.sum(narrow_lookup(p, V, width, idx) * gy)

    def loss_plain(t):
        return jnp.sum(embedding_lookup(t, idx, backend="xla") * gy)

    g_packed = jax.grad(loss_packed)(pack_narrow(table))
    g_plain = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(
        np.asarray(unpack_narrow(g_packed, V, width)),
        np.asarray(g_plain),
        rtol=2e-5, atol=2e-6,
    )


def test_embedding_bag_packed_layout():
    rng = np.random.default_rng(4)
    bag = EmbeddingBag(300, 32, layout="packed")
    table = bag.init(jax.random.key(0))
    k = packing_factor(32)
    assert table.shape == (75, 128)
    idx = jnp.asarray(rng.integers(0, 300, (8, 4)).astype(np.int32))
    out = bag.apply(table, idx)
    ref = embedding_forward_ref(
        np.asarray(unpack_narrow(table, 300, 32)), np.asarray(idx),
        mode=CombineMode.SUM,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-6)
