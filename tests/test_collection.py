"""EmbeddingCollection tests: multi-table forward, reorder invariance,
sparse training parity."""

import numpy as np

import jax
import jax.numpy as jnp

from cuembed_tpu import CombineMode, embedding_lookup
from cuembed_tpu.collection import EmbeddingCollection, TableConfig


def _make():
    return EmbeddingCollection(
        [
            TableConfig("ads", 500, 16, hotness=4, traffic_share=3.0),
            TableConfig("user", 300, 32, mode=CombineMode.MEAN, hotness=2),
        ]
    )


def test_apply_matches_single_lookups():
    coll = _make()
    tables = coll.init(jax.random.key(0))
    rng = np.random.default_rng(1)
    idx = {
        "ads": jnp.asarray(rng.integers(0, 500, (8, 4)).astype(np.int32)),
        "user": jnp.asarray(rng.integers(0, 300, (8, 2)).astype(np.int32)),
    }
    out = coll.apply(tables, idx, backend="xla")
    want_ads = embedding_lookup(tables["ads"], idx["ads"], backend="xla")
    want_user = embedding_lookup(
        tables["user"], idx["user"], mode=CombineMode.MEAN, backend="xla"
    )
    np.testing.assert_array_equal(np.asarray(out["ads"]), np.asarray(want_ads))
    np.testing.assert_array_equal(np.asarray(out["user"]), np.asarray(want_user))


def test_reorder_preserves_lookup_results():
    coll = _make()
    tables = coll.init(jax.random.key(2))
    rng = np.random.default_rng(3)
    idx_np = {
        "ads": rng.integers(0, 500, (32, 4)).astype(np.int32),
        "user": rng.integers(0, 300, (32, 2)).astype(np.int32),
    }
    counts = coll.init_counts()
    counts = coll.update_counts(counts, idx_np)
    new_tables, remaps = coll.reorder(tables, counts)
    for name in ("ads", "user"):
        before = embedding_lookup(
            tables[name], jnp.asarray(idx_np[name]),
            mode=coll.configs[name].mode, backend="xla",
        )
        after = embedding_lookup(
            new_tables[name], jnp.asarray(remaps[name][idx_np[name]]),
            mode=coll.configs[name].mode, backend="xla",
        )
        np.testing.assert_allclose(
            np.asarray(before), np.asarray(after), rtol=1e-6, atol=1e-6
        )


def test_sgd_update_matches_dense():
    coll = _make()
    tables = coll.init(jax.random.key(4))
    rng = np.random.default_rng(5)
    idx = {
        "ads": jnp.asarray(rng.integers(0, 500, (8, 4)).astype(np.int32)),
        "user": jnp.asarray(rng.integers(0, 300, (8, 2)).astype(np.int32)),
    }
    gy = {
        "ads": jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32)),
        "user": jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32)),
    }
    lr = 0.1
    new = coll.sgd_update(tables, idx, gy, lr=lr)
    for name in ("ads", "user"):
        def loss(t):
            return jnp.sum(
                embedding_lookup(
                    t, idx[name], mode=coll.configs[name].mode, backend="xla"
                )
                * gy[name]
            )

        want = tables[name] - lr * jax.grad(loss)(tables[name])
        np.testing.assert_allclose(
            np.asarray(new[name]), np.asarray(want), rtol=2e-5, atol=2e-5
        )


def test_adagrad_update_runs_and_accumulates():
    coll = _make()
    tables = coll.init(jax.random.key(6))
    accums = coll.adagrad_init()
    rng = np.random.default_rng(7)
    idx = {
        "ads": jnp.asarray(rng.integers(0, 500, (8, 4)).astype(np.int32)),
        "user": jnp.asarray(rng.integers(0, 300, (8, 2)).astype(np.int32)),
    }
    gy = {
        "ads": jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32)),
        "user": jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32)),
    }
    t2, a2 = coll.adagrad_update(tables, accums, idx, gy, lr=0.1)
    for name in ("ads", "user"):
        assert float(jnp.sum(a2[name])) > 0
        assert not np.allclose(np.asarray(t2[name]), np.asarray(tables[name]))


def test_hot_budget_split():
    coll = EmbeddingCollection(
        [
            TableConfig("big", 10_000_000, 256, dtype=jnp.bfloat16,
                        hotness=64, traffic_share=3.0),
            TableConfig("small", 1_000, 16),
        ],
    )
    # big table gets a tiered config; tiny table fits VMEM outright
    assert coll.tiered["big"] is not None
    assert coll.tiered["small"] is None
    assert coll.tiered["big"].hot_rows * 256 * 2 <= 84 * 1024 * 1024


def test_collection_sharded_flow():
    """shard -> apply_sharded -> adagrad_update_sharded matches the
    single-chip collection path."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(jax.devices()[:8]), ("model",))
    coll = EmbeddingCollection(
        [TableConfig("a", 777, 16), TableConfig("b", 512, 32)]
    )
    tables = coll.init(jax.random.key(0))
    accums = coll.adagrad_init()
    rng = np.random.default_rng(0)
    idx = {
        "a": rng.integers(0, 777, (64, 4)).astype(np.int32),
        "b": rng.integers(0, 512, (64, 2)).astype(np.int32),
    }
    want_out = coll.apply(tables, {k: jnp.asarray(v) for k, v in idx.items()})
    gy = {
        k: jnp.asarray(rng.standard_normal(np.asarray(v).shape).astype(np.float32))
        for k, v in want_out.items()
    }
    want_t, want_a = coll.adagrad_update(
        tables, accums, {k: jnp.asarray(v) for k, v in idx.items()}, gy,
        lr=0.1,
    )

    st = coll.shard(tables, mesh)
    sa = coll.adagrad_init_sharded(mesh)
    sh2 = NamedSharding(mesh, P("model", None))
    sidx = {k: jax.device_put(jnp.asarray(v), sh2) for k, v in idx.items()}
    sgy = {k: jax.device_put(v, sh2) for k, v in gy.items()}
    got_out = coll.apply_sharded(st, sidx, mesh=mesh)
    for k in idx:
        np.testing.assert_allclose(
            np.asarray(got_out[k]), np.asarray(want_out[k]),
            rtol=1e-5, atol=1e-5,
        )
    got_t, got_a = coll.adagrad_update_sharded(
        st, sa, sidx, sgy, mesh=mesh, lr=0.1
    )
    for k in idx:
        V = coll.configs[k].num_categories
        np.testing.assert_allclose(
            np.asarray(got_t[k])[:V], np.asarray(want_t[k]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got_a[k])[:V], np.asarray(want_a[k]),
            rtol=1e-5, atol=1e-6,
        )


# ---------------------------------------------------------------------------
# Feature -> shared-table mapping (torchrec's shared-table pattern)
# ---------------------------------------------------------------------------


def _shared_setup(rng):
    coll = EmbeddingCollection([
        TableConfig(
            "video", 500, 16, hotness=4,
            feature_names=("watched", "liked"),
        ),
        TableConfig("user", 200, 16, hotness=2),
    ])
    tables = coll.init(jax.random.key(0))
    idx = {
        "watched": jnp.asarray(
            rng.integers(0, 500, (24, 4)).astype(np.int32)
        ),
        "liked": jnp.asarray(
            rng.integers(0, 500, (24, 3)).astype(np.int32)
        ),
        "user": jnp.asarray(
            rng.integers(0, 200, (24, 2)).astype(np.int32)
        ),
    }
    return coll, tables, idx


def test_feature_mapping_validation():
    import pytest

    with pytest.raises(ValueError, match="claimed by both"):
        EmbeddingCollection([
            TableConfig("a", 100, 8, feature_names=("x", "y")),
            TableConfig("b", 100, 8, feature_names=("y",)),
        ])


def test_apply_features_matches_per_table():
    rng = np.random.default_rng(0)
    coll, tables, idx = _shared_setup(rng)
    out = coll.apply_features(tables, idx, backend="xla")
    assert set(out) == {"watched", "liked", "user"}
    for f in idx:
        name = coll.feature_to_table[f]
        want = embedding_lookup(tables[name], idx[f], backend="xla")
        np.testing.assert_allclose(
            np.asarray(out[f]), np.asarray(want), rtol=1e-6, atol=1e-6,
            err_msg=f,
        )


def test_update_counts_features_aggregates():
    rng = np.random.default_rng(1)
    coll, _, idx = _shared_setup(rng)
    counts = coll.init_counts()
    counts = coll.update_counts_features(
        counts, {f: np.asarray(v) for f, v in idx.items()}
    )
    # both video features land in the ONE shared table's counts
    nnz_video = idx["watched"].size + idx["liked"].size
    assert counts["video"].sum() == nnz_video
    assert counts["user"].sum() == idx["user"].size


def test_sgd_update_features_joint_equals_sequential():
    """SGD is linear in the gradient: the joint shared-table update must
    equal applying each feature's sparse update in sequence."""
    from cuembed_tpu.train import sgd_sparse_update

    rng = np.random.default_rng(2)
    coll, tables, idx = _shared_setup(rng)
    gys = {
        f: jnp.asarray(rng.standard_normal((24, 16)).astype(np.float32))
        for f in idx
    }
    new = coll.sgd_update_features(tables, idx, gys, lr=0.1)

    seq = tables["video"]
    for f in ("watched", "liked"):
        seq = sgd_sparse_update(seq, idx[f], gys[f], lr=0.1)
    np.testing.assert_allclose(
        np.asarray(new["video"]), np.asarray(seq), rtol=1e-5, atol=1e-6
    )
    want_user = sgd_sparse_update(
        tables["user"], idx["user"], gys["user"], lr=0.1
    )
    np.testing.assert_allclose(
        np.asarray(new["user"]), np.asarray(want_user),
        rtol=1e-5, atol=1e-6,
    )


def test_adagrad_update_features_joint_golden():
    """AdaGrad must see the per-row gradient summed ACROSS features
    before squaring (joint-batch semantics, not sequential updates)."""
    rng = np.random.default_rng(3)
    coll, tables, idx = _shared_setup(rng)
    gys = {
        f: jnp.asarray(rng.standard_normal((24, 16)).astype(np.float32))
        for f in idx
    }
    accums = coll.adagrad_init()
    new_t, new_a = coll.adagrad_update_features(
        tables, accums, idx, gys, lr=0.1
    )

    # numpy golden: joint summed per-row gradient for the shared table
    V, W = 500, 16
    G = np.zeros((V, W), np.float64)
    for f in ("watched", "liked"):
        for b in range(24):
            for h in range(np.asarray(idx[f]).shape[1]):
                G[np.asarray(idx[f])[b, h]] += np.asarray(gys[f])[b]
    touched = np.abs(G).sum(axis=1) > 0
    acc = np.zeros((V,), np.float64)
    acc[touched] = (G[touched] ** 2).mean(axis=1)
    table = np.asarray(tables["video"], np.float64).copy()
    table[touched] -= (
        0.1 * G[touched] / np.sqrt(acc[touched, None] + 1e-8)
    )
    np.testing.assert_allclose(
        np.asarray(new_t["video"]), table, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_a["video"]), acc, rtol=1e-4, atol=1e-6
    )
