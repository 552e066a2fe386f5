"""Differentiable-API tests — the analog of the reference's framework-parity
suite (``examples/pytorch/cuembed_test.py``): the custom_vjp lookup must
match a plain-jnp EmbeddingBag model in both forward (exact) and backward.

Because our backward is sort + segment-sum (no atomics), gradient parity can
be *exact* on integer-exact data — stronger than the reference, which needs
``allclose`` (``cuembed_test.py:33``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuembed_tpu import CombineMode, embedding_lookup, embedding_lookup_csr
from cuembed_tpu.utils import AllocationOptions, allocate


def _bag_reference(table, indices, weights=None, mode=CombineMode.SUM):
    """Plain-jnp EmbeddingBag (the nn.EmbeddingBag analog)."""
    rows = jnp.take(table, indices, axis=0)
    if mode == CombineMode.CONCAT:
        b, h = indices.shape
        return rows.reshape(b * h, table.shape[1])
    if weights is not None:
        rows = rows * weights[..., None]
    out = jnp.sum(rows, axis=1)
    if mode == CombineMode.MEAN:
        out = out / indices.shape[1]
    return out


@pytest.fixture(scope="module")
def problem():
    o = AllocationOptions(
        num_categories=300, batch_size=32, hotness=6, embed_width=16, alpha=1.05
    )
    return allocate(o, forward_only=True)


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN, CombineMode.CONCAT])
def test_forward_matches_bag(problem, mode):
    got = embedding_lookup(problem.table, problem.indices, mode=mode, backend="xla")
    ref = _bag_reference(problem.table, problem.indices, mode=mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN, CombineMode.CONCAT])
def test_grad_matches_bag(problem, mode):
    """Integer-valued cotangent => exact gradient parity."""
    table = problem.table
    idx = problem.indices
    rng = np.random.default_rng(0)
    ct = rng.integers(-10, 11, size=(32 * 6 if mode == CombineMode.CONCAT else 32, 16))
    ct = jnp.asarray(ct, dtype=jnp.float32)

    def loss_ours(t):
        return jnp.vdot(embedding_lookup(t, idx, mode=mode, backend="xla"), ct)

    def loss_ref(t):
        return jnp.vdot(_bag_reference(t, idx, mode=mode), ct)

    g_ours = jax.grad(loss_ours)(table)
    g_ref = jax.grad(loss_ref)(table)
    if mode == CombineMode.MEAN:
        np.testing.assert_allclose(
            np.asarray(g_ours), np.asarray(g_ref), rtol=1e-6, atol=1e-6
        )
    else:
        np.testing.assert_array_equal(np.asarray(g_ours), np.asarray(g_ref))


def test_weighted_grads(problem):
    """Gradients flow to both table and weights (extension past the reference)."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(
        np.where(rng.random(problem.indices.shape) < 0.5, 0.5, 0.25), jnp.float32
    )
    idx = problem.indices
    table = jnp.asarray(problem.table)

    def loss_ours(t, w_):
        return jnp.sum(embedding_lookup(t, idx, w_, backend="xla") ** 2)

    def loss_ref(t, w_):
        return jnp.sum(_bag_reference(t, idx, w_) ** 2)

    go_t, go_w = jax.grad(loss_ours, argnums=(0, 1))(table, w)
    gr_t, gr_w = jax.grad(loss_ref, argnums=(0, 1))(table, w)
    np.testing.assert_allclose(np.asarray(go_t), np.asarray(gr_t), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(go_w), np.asarray(gr_w), rtol=1e-5, atol=1e-5)


def test_csr_forward_and_grad():
    o = AllocationOptions(
        num_categories=200,
        batch_size=17,
        hotness=5,
        embed_width=8,
        alpha=0.0,
        is_csr=True,
    )
    a = allocate(o, forward_only=True)
    table = jnp.asarray(a.table)
    idx = jnp.asarray(a.indices)
    offs = jnp.asarray(a.offsets)

    # Reference via dense expansion with masking.
    def ref_fn(t):
        out = []
        for i in range(o.batch_size):
            s, e = int(a.offsets[i]), int(a.offsets[i + 1])
            out.append(
                jnp.sum(jnp.take(t, idx[s:e], axis=0), axis=0)
                if e > s
                else jnp.zeros((o.embed_width,), t.dtype)
            )
        return jnp.stack(out)

    got = embedding_lookup_csr(table, idx, offs, backend="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref_fn(table)), rtol=1e-5, atol=1e-6
    )

    ct = jnp.asarray(
        np.random.default_rng(2).integers(-5, 6, size=(o.batch_size, o.embed_width)),
        jnp.float32,
    )
    g_ours = jax.grad(lambda t: jnp.vdot(embedding_lookup_csr(t, idx, offs, backend="xla"), ct))(table)
    g_ref = jax.grad(lambda t: jnp.vdot(ref_fn(t), ct))(table)
    np.testing.assert_array_equal(np.asarray(g_ours), np.asarray(g_ref))


def test_csr_mean_grad():
    o = AllocationOptions(
        num_categories=100, batch_size=9, hotness=4, embed_width=8, is_csr=True,
        combine_mode=CombineMode.MEAN,
    )
    a = allocate(o, forward_only=True)
    table = jnp.asarray(a.table)
    idx = jnp.asarray(a.indices)
    offs = jnp.asarray(a.offsets)

    def ref_fn(t):
        out = []
        for i in range(o.batch_size):
            s, e = int(a.offsets[i]), int(a.offsets[i + 1])
            out.append(
                jnp.mean(jnp.take(t, idx[s:e], axis=0), axis=0)
                if e > s
                else jnp.zeros((o.embed_width,), t.dtype)
            )
        return jnp.stack(out)

    got = embedding_lookup_csr(table, idx, offs, mode=CombineMode.MEAN, backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_fn(table)), rtol=1e-6, atol=1e-7)

    ct = jnp.ones((o.batch_size, o.embed_width), jnp.float32)
    g_ours = jax.grad(
        lambda t: jnp.vdot(
            embedding_lookup_csr(t, idx, offs, mode=CombineMode.MEAN, backend="xla"), ct
        )
    )(table)
    g_ref = jax.grad(lambda t: jnp.vdot(ref_fn(t), ct))(table)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), rtol=1e-6, atol=1e-7)


def test_jit_and_shapes_stable():
    """The whole lookup (fwd+bwd) jits as one program."""
    o = AllocationOptions(num_categories=50, batch_size=4, hotness=3, embed_width=8)
    a = allocate(o, forward_only=True)

    @jax.jit
    def step(t, idx):
        return jax.grad(lambda t_: jnp.sum(embedding_lookup(t_, idx, backend="xla")))(t)

    g = step(jnp.asarray(a.table), jnp.asarray(a.indices))
    assert g.shape == a.table.shape
