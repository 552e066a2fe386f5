"""Checkpoint/resume smoke test (beyond the reference, which owns no
state): collection tables + optimizer accumulators + frequency counts
round-trip through orbax."""

import numpy as np
import pytest

ocp = pytest.importorskip("orbax.checkpoint")

import jax
import jax.numpy as jnp

from cuembed_tpu import EmbeddingCollection, TableConfig


def test_collection_state_roundtrip(tmp_path):
    coll = EmbeddingCollection(
        [TableConfig("a", 100, 8), TableConfig("b", 50, 4)]
    )
    tables = coll.init(jax.random.key(0))
    accums = coll.adagrad_init()
    counts = coll.init_counts()
    counts = coll.update_counts(
        counts, {"a": np.array([1, 2, 2]), "b": np.array([3])}
    )
    state = {
        "tables": tables,
        "accums": accums,
        "counts": {k: jnp.asarray(v) for k, v in counts.items()},
    }

    path = tmp_path / "ckpt"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    restored = ckptr.restore(path, state)

    for k in tables:
        np.testing.assert_array_equal(
            np.asarray(restored["tables"][k]), np.asarray(tables[k])
        )
    np.testing.assert_array_equal(
        np.asarray(restored["counts"]["a"]), counts["a"]
    )


def test_sharded_table_state_roundtrip(tmp_path):
    """Row-sharded table + co-sharded AdaGrad accumulator round-trip
    with their shardings preserved (the multi-chip resume path)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(jax.devices()[:8]), ("model",))
    rng = np.random.default_rng(0)
    table = jax.device_put(
        jnp.asarray(rng.standard_normal((256, 16)).astype(np.float32)),
        NamedSharding(mesh, P("model", None)),
    )
    accum = jax.device_put(
        jnp.asarray(rng.random(256).astype(np.float32)),
        NamedSharding(mesh, P("model")),
    )
    state = {"table": table, "accum": accum}

    path = tmp_path / "ckpt_sharded"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    # Restore with the target shardings (abstract pytree), as a fresh
    # process would after re-creating the mesh.
    target = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        state,
    )
    restored = ckptr.restore(path, target)
    np.testing.assert_array_equal(
        np.asarray(restored["table"]), np.asarray(table)
    )
    np.testing.assert_array_equal(
        np.asarray(restored["accum"]), np.asarray(accum)
    )
    assert restored["table"].sharding == table.sharding
    assert restored["accum"].sharding == accum.sharding


def test_planner_placed_collection_roundtrip(tmp_path):
    """A planner-placed mixed collection (all five placements) plus its
    co-sharded AdaGrad accumulators round-trips with every sharding
    preserved — the full multi-chip resume path."""
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from cuembed_tpu.parallel import (
        CostModel,
        apply_plan,
        plan,
        planned_adagrad_init,
    )

    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model")
    )
    cost = CostModel(
        hbm_bytes=1 << 30,
        replicate_bytes_max=64 * 1024,
        column_rows_max=128,
        grid_bytes_min=1 << 16,
    )
    configs = [
        TableConfig("tiny", 64, 16, hotness=4),
        TableConfig("big", 4096, 32, hotness=4),
        TableConfig("wide", 64, 512, hotness=2),
        TableConfig("skew", 8192, 32, hotness=4),
        TableConfig("grid", 4096, 256, hotness=4),
    ]
    p = plan(
        configs, 4, batch=8192, cost=cost,
        head_hit_rate={"skew": 0.9}, column_ok=True,
        grid_ok=True, col_shards=2,
        hot_bytes_total=5 * 1024 * 128 * 4,
    )
    assert {tp.placement for tp in p.tables.values()} == {
        "replicated", "row_sharded", "column_sharded", "hybrid",
        "grid_sharded",
    }
    rng = np.random.default_rng(3)
    tables = {
        c.name: jnp.asarray(
            rng.standard_normal((c.num_categories, c.width)).astype(
                np.float32
            )
        )
        for c in configs
    }
    placed = apply_plan(p, tables, mesh)
    accums = planned_adagrad_init(p, placed, mesh)
    state = {"tables": placed, "accums": accums}

    path = tmp_path / "ckpt_planned"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    target = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=x.sharding
        ),
        state,
    )
    restored = ckptr.restore(path, target)

    def _leaves(v):
        return v if isinstance(v, tuple) else (v,)

    for name in tables:
        for got, want in zip(
            _leaves(restored["tables"][name]), _leaves(placed[name])
        ):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
            assert got.sharding == want.sharding, name
        for got, want in zip(
            _leaves(restored["accums"][name]), _leaves(accums[name])
        ):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
            assert got.sharding == want.sharding, name
