"""BASELINE config 5 shape: 8 sharded tables + all-to-all exchange feeding
a data-parallel dense tower, on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuembed_tpu import embedding_lookup
from cuembed_tpu.parallel import alltoall_row_sharded_lookup

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

N_TABLES = 8
V, W, B, H = 512, 16, 64, 4


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("model",))


def test_eight_sharded_tables_alltoall_train_step(mesh):
    rng = np.random.default_rng(0)
    shard = NamedSharding(mesh, P("model", None))
    repl = NamedSharding(mesh, P())

    tables = [
        jax.device_put(
            jnp.asarray(rng.standard_normal((V, W)).astype(np.float32)), shard
        )
        for _ in range(N_TABLES)
    ]
    idx = [
        jax.device_put(
            jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32)), shard
        )
        for _ in range(N_TABLES)
    ]
    dense_w = jax.device_put(
        jnp.asarray(rng.standard_normal((N_TABLES * W, 1)).astype(np.float32)),
        repl,
    )
    labels = jax.device_put(
        jnp.asarray(rng.integers(0, 2, B).astype(np.float32)),
        NamedSharding(mesh, P("model")),
    )

    def loss_fn(params):
        tabs, dw = params
        pooled = [
            alltoall_row_sharded_lookup(t, ix, mesh=mesh)
            for t, ix in zip(tabs, idx)
        ]
        feats = jnp.concatenate(pooled, axis=1)  # [B, N_TABLES*W]
        logits = (feats @ dw)[:, 0]
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    @jax.jit
    def train_step(params):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        new = jax.tree_util.tree_map(lambda p, g: p - 0.1 * g, params, grads)
        return new, loss

    (new_tables, new_dw), loss = train_step((tables, dense_w))
    assert bool(jnp.isfinite(loss))

    # parity vs a single-device replica of the same model
    tables_h = [np.asarray(t) for t in tables]
    idx_h = [np.asarray(ix) for ix in idx]

    def loss_single(params):
        tabs, dw = params
        pooled = [
            embedding_lookup(t, jnp.asarray(ix), backend="xla")
            for t, ix in zip(tabs, idx_h)
        ]
        feats = jnp.concatenate(pooled, axis=1)
        logits = (feats @ dw)[:, 0]
        lab = jnp.asarray(np.asarray(labels))
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * lab
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    loss_ref, grads_ref = jax.value_and_grad(loss_single)(
        ([jnp.asarray(t) for t in tables_h], jnp.asarray(np.asarray(dense_w)))
    )
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    for got, want_t, want_g in zip(new_tables, tables_h, grads_ref[0]):
        np.testing.assert_allclose(
            np.asarray(got), want_t - 0.1 * np.asarray(want_g),
            rtol=1e-4, atol=1e-5,
        )
