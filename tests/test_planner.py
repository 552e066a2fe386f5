"""Placement planner: decision logic + end-to-end parity on the mesh.

The planner is the torchrec-EmbeddingShardingPlanner analog (the
reference itself is single-GPU, ``README.md:110``). Decision tests are
pure host logic; the end-to-end tests place a mixed collection on the
virtual 8-device mesh and check every placement's lookup and sparse
update against the single-chip reference ops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cuembed_tpu import CombineMode, embedding_lookup
from cuembed_tpu.collection import TableConfig
from cuembed_tpu.parallel import (
    CostModel,
    PlanError,
    apply_plan,
    plan,
    planned_adagrad_init,
    planned_adagrad_update,
    planned_lookup,
    planned_sgd_update,
)
from cuembed_tpu.train import (
    rowwise_adagrad_sparse_update,
    sgd_sparse_update,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

# Tiny cost model so small test tables exercise every placement branch.
TEST_COST = CostModel(
    hbm_bytes=1 << 30,
    replicate_bytes_max=64 * 1024,      # replicate under 64 KB
    column_rows_max=4096,
    hybrid_min_hit_rate=0.5,
)


# ---------------------------------------------------------------------------
# Decision logic (no devices)
# ---------------------------------------------------------------------------


def test_plan_placements():
    configs = [
        TableConfig("small", 64, 16),                       # 64*128*4 = 32 KB
        TableConfig("big", 100_000, 64, hotness=4),          # 51 MB padded
        TableConfig("wide", 2048, 128 * 8),                  # few rows, wide
        TableConfig("skewed", 100_000, 64, hotness=4),
    ]
    p = plan(
        configs, 8, batch=65536, cost=TEST_COST,
        head_hit_rate={"skewed": 0.8}, column_ok=True,
        hot_bytes_total=4 * 512 * 1024,  # split over 4 tables
    )
    assert p.tables["small"].placement == "replicated"
    assert p.tables["big"].placement == "row_sharded"
    assert p.tables["wide"].placement == "column_sharded"
    assert p.tables["skewed"].placement == "hybrid"
    assert p.tables["skewed"].hot_rows >= 1024
    assert p.tables["skewed"].hot_rows % 8 == 0
    # hybrid routes less than the equivalent row-sharded table
    assert (
        p.tables["skewed"].comm_bytes_per_step
        < p.tables["big"].comm_bytes_per_step
    )
    assert "plan over 8 shards" in p.summary()


def test_plan_no_hybrid_without_stats():
    configs = [TableConfig("t", 100_000, 64, hotness=4)]
    p = plan(configs, 8, batch=256, cost=TEST_COST)
    assert p.tables["t"].placement == "row_sharded"


def test_plan_column_needs_opt_in():
    configs = [TableConfig("wide", 2048, 128 * 8)]
    p = plan(configs, 8, batch=256, cost=TEST_COST, column_ok=False)
    assert p.tables["wide"].placement == "row_sharded"


def test_plan_over_budget_raises():
    configs = [TableConfig("huge", 40_000_000, 256)]
    with pytest.raises(PlanError, match="huge"):
        plan(configs, 8, batch=256, cost=TEST_COST)


def test_plan_single_shard_replicates():
    p = plan(
        [TableConfig("t", 100_000, 64)], 1, batch=256, cost=TEST_COST
    )
    assert p.tables["t"].placement == "replicated"
    assert p.tables["t"].comm_bytes_per_step == 0


# ---------------------------------------------------------------------------
# End-to-end on the virtual mesh
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mesh():
    return Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model")
    )


def _mixed_setup(mesh, rng):
    configs = [
        TableConfig("small", 64, 16, hotness=4),
        TableConfig("big", 4096, 32, hotness=4),
        TableConfig("wide", 512, 512, hotness=2),
        TableConfig("skewed", 4096, 32, hotness=4),
    ]
    cost = CostModel(
        hbm_bytes=1 << 30,
        replicate_bytes_max=64 * 1024,
        column_rows_max=1024,
        hybrid_min_hit_rate=0.5,
    )
    # Planning batch = the production batch (sizes the comm estimates and
    # the hybrid-vs-psum tradeoff); the test arrays below use a small
    # batch for speed — only the placement decision depends on this.
    p = plan(
        configs, 4, batch=8192, cost=cost,
        head_hit_rate={"skewed": 0.75}, column_ok=True,
        hot_bytes_total=4 * 1024 * 128 * 4,  # split over 4 tables
    )
    assert {tp.placement for tp in p.tables.values()} == {
        "replicated", "row_sharded", "column_sharded", "hybrid",
    }
    tables = {
        c.name: jnp.asarray(
            rng.standard_normal((c.num_categories, c.width)).astype(
                np.float32
            )
        )
        for c in configs
    }
    # skew the draws for the hybrid table toward its head
    idx = {}
    for c in configs:
        if c.name == "skewed":
            lo = rng.integers(
                0, p.tables["skewed"].hot_rows, (48, c.hotness)
            )
            hi = rng.integers(0, c.num_categories, (16, c.hotness))
            idx[c.name] = jnp.asarray(
                np.concatenate([lo, hi]).astype(np.int32)
            )
        else:
            idx[c.name] = jnp.asarray(
                rng.integers(0, c.num_categories, (64, c.hotness)).astype(
                    np.int32
                )
            )
    return configs, p, tables, idx


def test_planned_lookup_matches_single_chip(mesh):
    rng = np.random.default_rng(0)
    configs, p, tables, idx = _mixed_setup(mesh, rng)
    placed = apply_plan(p, tables, mesh)
    assert isinstance(placed["skewed"], tuple)
    got = planned_lookup(p, placed, idx, mesh=mesh)
    for c in configs:
        want = embedding_lookup(
            tables[c.name], idx[c.name], mode=CombineMode.SUM,
            backend="xla",
        )
        np.testing.assert_allclose(
            np.asarray(got[c.name]), np.asarray(want),
            rtol=1e-5, atol=1e-5, err_msg=c.name,
        )


def test_planned_sgd_matches_single_chip(mesh):
    rng = np.random.default_rng(1)
    configs, p, tables, idx = _mixed_setup(mesh, rng)
    placed = apply_plan(p, tables, mesh)
    gys = {
        c.name: jnp.asarray(
            rng.standard_normal((64, c.width)).astype(np.float32)
        )
        for c in configs
    }
    new = planned_sgd_update(
        p, placed, idx, gys, mesh=mesh, lr=0.1
    )
    for c in configs:
        want = sgd_sparse_update(
            tables[c.name], idx[c.name], gys[c.name], lr=0.1,
            mode=CombineMode.SUM,
        )
        tp = p.tables[c.name]
        if tp.placement == "hybrid":
            head, tail = new[c.name]
            got_full = np.concatenate(
                [np.asarray(head), np.asarray(tail)]
            )[: c.num_categories]
        else:
            got_full = np.asarray(new[c.name])[: c.num_categories]
        np.testing.assert_allclose(
            got_full, np.asarray(want), rtol=1e-4, atol=1e-5,
            err_msg=f"{c.name} ({tp.placement})",
        )


def test_planned_adagrad_matches_single_chip(mesh):
    rng = np.random.default_rng(2)
    configs, p, tables, idx = _mixed_setup(mesh, rng)
    placed = apply_plan(p, tables, mesh)
    accums = planned_adagrad_init(p, placed, mesh)
    gys = {
        c.name: jnp.asarray(
            rng.standard_normal((64, c.width)).astype(np.float32)
        )
        for c in configs
    }
    new_t, new_a = planned_adagrad_update(
        p, placed, accums, idx, gys, mesh=mesh, lr=0.1
    )
    for c in configs:
        want_t, want_a = rowwise_adagrad_sparse_update(
            tables[c.name],
            jnp.zeros((c.num_categories,), jnp.float32),
            idx[c.name], gys[c.name], lr=0.1, mode=CombineMode.SUM,
        )
        if p.tables[c.name].placement == "hybrid":
            got_t = np.concatenate(
                [np.asarray(x) for x in new_t[c.name]]
            )[: c.num_categories]
            got_a = np.concatenate(
                [np.asarray(x) for x in new_a[c.name]]
            )[: c.num_categories]
        else:
            got_t = np.asarray(new_t[c.name])[: c.num_categories]
            got_a = np.asarray(new_a[c.name])[: c.num_categories]
        np.testing.assert_allclose(
            got_t, np.asarray(want_t), rtol=1e-4, atol=1e-5,
            err_msg=c.name,
        )
        np.testing.assert_allclose(
            got_a, np.asarray(want_a), rtol=1e-4, atol=1e-5,
            err_msg=c.name,
        )


def test_planned_replicated_replicas_stay_identical(mesh):
    """After an update, every replica of a replicated table is bitwise
    identical (the all-gathered COO makes the update deterministic)."""
    rng = np.random.default_rng(3)
    configs = [TableConfig("small", 64, 16, hotness=4)]
    p = plan(configs, 4, batch=64, cost=TEST_COST)
    tables = {
        "small": jnp.asarray(
            rng.standard_normal((64, 16)).astype(np.float32)
        )
    }
    placed = apply_plan(p, tables, mesh)
    idx = {
        "small": jnp.asarray(
            rng.integers(0, 64, (64, 4)).astype(np.int32)
        )
    }
    gys = {
        "small": jnp.asarray(
            rng.standard_normal((64, 16)).astype(np.float32)
        )
    }
    new = planned_sgd_update(p, placed, idx, gys, mesh=mesh, lr=0.1)
    shards = [
        np.asarray(s.data) for s in new["small"].addressable_shards
    ]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_apply_plan_wrong_mesh_raises(mesh):
    p = plan([TableConfig("t", 4096, 32)], 8, batch=64, cost=TEST_COST)
    with pytest.raises(PlanError, match="mesh axis"):
        apply_plan(p, {"t": jnp.zeros((4096, 32))}, mesh)  # axis has 4


def test_collection_plan_placement_from_counts():
    """Collection -> counts -> hit rates -> plan: the skewed table goes
    hybrid from measured stats, the uniform one stays row-sharded."""
    from cuembed_tpu.collection import EmbeddingCollection

    rng = np.random.default_rng(4)
    coll = EmbeddingCollection(
        [
            TableConfig("uniform", 100_000, 64, hotness=4),
            TableConfig("zipf", 100_000, 64, hotness=4),
        ]
    )
    counts = coll.init_counts()
    counts = coll.update_counts(
        counts,
        {
            "uniform": rng.integers(0, 100_000, 100_000),
            "zipf": np.minimum(
                rng.zipf(1.3, 100_000) - 1, 99_999
            ).astype(np.int64),
        },
    )
    hits = coll.head_hit_rates(counts, hot_bytes_total=2 * 512 * 1024)
    assert hits["zipf"] > 0.7 > 0.2 > hits["uniform"]
    p = coll.plan_placement(
        8, batch=65536, counts=counts, cost=TEST_COST,
        hot_bytes_total=2 * 512 * 1024,  # split over 2 tables
    )
    assert p.tables["zipf"].placement == "hybrid"
    assert p.tables["uniform"].placement == "row_sharded"
    # without stats nothing goes hybrid
    p2 = coll.plan_placement(8, batch=65536, cost=TEST_COST)
    assert all(
        tp.placement == "row_sharded" for tp in p2.tables.values()
    )


def test_planned_lookup_replicated_accepts_csr_blocks(mesh):
    """One CSR batch layout serves every placement: the replicated
    branch takes the same shard_csr blocks the routed tables need and
    returns the same [n, local_batch, W] block convention."""
    from cuembed_tpu.parallel import shard_csr
    from cuembed_tpu import embedding_lookup_csr

    rng = np.random.default_rng(5)
    configs = [TableConfig("small", 64, 16, hotness=4)]
    p = plan(configs, 4, batch=64, cost=TEST_COST)
    assert p.tables["small"].placement == "replicated"
    tables = {
        "small": jnp.asarray(
            rng.standard_normal((64, 16)).astype(np.float32)
        )
    }
    placed = apply_plan(p, tables, mesh)
    B = 16
    hots = rng.integers(0, 5, B)
    offs = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    vals = rng.integers(0, 64, max(int(offs[-1]), 1)).astype(np.int32)
    ib, ob, _ = shard_csr(vals, offs, 4)
    got = planned_lookup(
        p, placed,
        {"small": jnp.asarray(ib)},
        offsets={"small": jnp.asarray(ob)},
        mesh=mesh,
    )["small"]
    want = embedding_lookup_csr(
        tables["small"], jnp.asarray(vals), jnp.asarray(offs)
    )
    np.testing.assert_allclose(
        np.asarray(got).reshape(B, 16), np.asarray(want),
        rtol=1e-5, atol=1e-5,
    )


def test_planned_updates_replicated_csr_blocks(mesh):
    """Replicated-table sparse SGD and AdaGrad take the same shard_csr
    blocks as routed tables; result equals the single-chip CSR update
    and replicas stay identical."""
    from cuembed_tpu.parallel import shard_csr
    from cuembed_tpu.train import rowwise_adagrad_init

    rng = np.random.default_rng(6)
    configs = [TableConfig("small", 64, 16, hotness=4)]
    p = plan(configs, 4, batch=64, cost=TEST_COST)
    table = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    placed = apply_plan(p, {"small": table}, mesh)
    B = 16
    hots = rng.integers(0, 5, B)
    offs = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    vals = rng.integers(0, 64, max(int(offs[-1]), 1)).astype(np.int32)
    gy = jnp.asarray(rng.standard_normal((B, 16)).astype(np.float32))
    ib, ob, _ = shard_csr(vals, offs, 4)
    args = dict(
        indices={"small": jnp.asarray(ib)},
        offsets={"small": jnp.asarray(ob)},
        mesh=mesh,
    )

    want_sgd = sgd_sparse_update(
        table, jnp.asarray(vals), gy, lr=0.1, offsets=jnp.asarray(offs)
    )
    got = planned_sgd_update(
        p, placed, grads_y={"small": gy}, lr=0.1, **args
    )["small"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want_sgd), rtol=1e-5, atol=1e-6
    )
    shards = [np.asarray(s.data) for s in got.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)

    want_t, want_a = rowwise_adagrad_sparse_update(
        table, rowwise_adagrad_init(64), jnp.asarray(vals), gy, lr=0.1,
        offsets=jnp.asarray(offs),
    )
    accums = planned_adagrad_init(p, placed, mesh)
    got_t, got_a = planned_adagrad_update(
        p, placed, accums, grads_y={"small": gy}, lr=0.1, **args
    )
    np.testing.assert_allclose(
        np.asarray(got_t["small"]), np.asarray(want_t),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got_a["small"]), np.asarray(want_a),
        rtol=1e-5, atol=1e-6,
    )


def test_head_hit_rates_requires_evidence():
    """A uniform table calibrated on a sample smaller than the head
    must NOT masquerade as skewed (top-k of a sparse sample is ~100%
    for any distribution) — the estimator refuses to judge it."""
    from cuembed_tpu.collection import EmbeddingCollection

    rng = np.random.default_rng(9)
    coll = EmbeddingCollection(
        [TableConfig("uniform", 200_000, 64, hotness=4)]
    )
    counts = coll.update_counts(
        coll.init_counts(),
        {"uniform": rng.integers(0, 200_000, 1024)},  # sparse sample
    )
    hits = coll.head_hit_rates(counts, hot_bytes_total=2 * 2**20)
    assert "uniform" not in hits
    # plenty of evidence: the honest (low) rate comes through
    counts = coll.update_counts(
        counts, {"uniform": rng.integers(0, 200_000, 400_000)}
    )
    hits = coll.head_hit_rates(counts, hot_bytes_total=2 * 2**20)
    assert 0.0 < hits["uniform"] < 0.1


# ---------------------------------------------------------------------------
# Grid placement
# ---------------------------------------------------------------------------

GRID_COST = CostModel(
    hbm_bytes=1 << 30,
    replicate_bytes_max=64 * 1024,
    grid_bytes_min=1 << 20,  # grid above 1 MB/device row-sharded
)


def test_plan_grid_needs_opt_in_and_eligibility():
    big_wide = TableConfig("bw", 100_000, 256, hotness=4)
    p = plan([big_wide], 4, batch=1024, cost=GRID_COST)
    assert p.tables["bw"].placement == "row_sharded"
    p = plan(
        [big_wide], 4, batch=1024, cost=GRID_COST,
        grid_ok=True, col_shards=2,
    )
    assert p.tables["bw"].placement == "grid_sharded"
    assert p.col_shards == 2
    # per-device bytes shrink by the column count vs row sharding
    row_p = plan([big_wide], 4, batch=1024, cost=GRID_COST)
    assert (
        p.tables["bw"].bytes_per_device
        == -(-row_p.tables["bw"].bytes_per_device // 2)
    )
    # narrow table: a 128-wide row can't split into full lane tiles
    narrow = TableConfig("n", 100_000, 128, hotness=4)
    p = plan(
        [narrow], 4, batch=1024, cost=GRID_COST,
        grid_ok=True, col_shards=2,
    )
    assert p.tables["n"].placement == "row_sharded"
    with pytest.raises(PlanError, match="col_shards"):
        plan([big_wide], 4, batch=1024, cost=GRID_COST, grid_ok=True)


def test_apply_plan_grid_mesh_mismatch_raises(mesh):
    cfg = TableConfig("bw", 4096, 512, hotness=4)
    p = plan(
        [cfg], 4, batch=1024, cost=GRID_COST, grid_ok=True, col_shards=4,
    )
    assert p.tables["bw"].placement == "grid_sharded"
    t = {"bw": jnp.zeros((4096, 512), jnp.float32)}
    with pytest.raises(PlanError, match="column shards"):
        apply_plan(p, t, mesh)  # mesh data axis has 2, plan wants 4


def test_planned_grid_lookup_and_updates_match_single_chip(mesh):
    rng = np.random.default_rng(7)
    V, W, B, H = 512, 256, 64, 4
    cfg = TableConfig("bw", V, W, hotness=H)
    small_grid_cost = CostModel(
        hbm_bytes=1 << 30,
        replicate_bytes_max=64 * 1024,
        grid_bytes_min=1 << 16,  # tiny test table must still go grid
    )
    p = plan(
        [cfg], 4, batch=8192, cost=small_grid_cost,
        grid_ok=True, col_shards=2,
    )
    assert p.tables["bw"].placement == "grid_sharded"
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    placed = apply_plan(p, {"bw": table}, mesh)

    got = planned_lookup(p, placed, {"bw": idx}, mesh=mesh)["bw"]
    want = embedding_lookup(table, idx, backend="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )

    new = planned_sgd_update(
        p, placed, {"bw": idx}, {"bw": gy}, mesh=mesh, lr=0.1,
    )["bw"]
    want_t = sgd_sparse_update(table, idx, gy, lr=0.1)
    np.testing.assert_allclose(
        np.asarray(new)[:V], np.asarray(want_t), rtol=1e-5, atol=1e-5
    )

    accums = planned_adagrad_init(p, placed, mesh)
    new_t, new_a = planned_adagrad_update(
        p, placed, accums, {"bw": idx}, {"bw": gy}, mesh=mesh, lr=0.1,
    )
    want_t2, want_a = rowwise_adagrad_sparse_update(
        table, jnp.zeros((V,), jnp.float32), idx, gy, lr=0.1
    )
    np.testing.assert_allclose(
        np.asarray(new_t["bw"])[:V], np.asarray(want_t2),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_a["bw"])[:V], np.asarray(want_a),
        rtol=1e-4, atol=1e-5,
    )


def test_planned_grid_csr_lookup_and_update():
    """CSR-trained tables keep the grid placement: sharded-CSR blocks
    flow through the planned grid lookup and sparse update with no
    runtime raise, matching the single-chip CSR semantics (reference
    treats CSR co-equal with fixed: embedding_lookup.cuh:261-267)."""
    from cuembed_tpu.ops.api import embedding_lookup_csr
    from cuembed_tpu.parallel import shard_csr

    cfg = TableConfig("bw", 4096, 512, hotness=4)
    p = plan(
        [cfg], 4, batch=1024, cost=GRID_COST, grid_ok=True, col_shards=2,
    )
    assert p.tables["bw"].placement == "grid_sharded"
    m = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("model", "data"))
    rng = np.random.default_rng(41)
    V, W, B = 4096, 512, 64
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    hots = rng.integers(0, 5, B)
    offs = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    vals = rng.integers(0, V, max(int(offs[-1]), 1)).astype(np.int32)
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    ib, ob, _ = shard_csr(vals, offs, 4)
    placed = apply_plan(p, {"bw": table}, m)
    sh = jax.sharding.NamedSharding(
        m, jax.sharding.PartitionSpec("model", None)
    )
    ibs = jax.device_put(jnp.asarray(ib), sh)
    obs = jax.device_put(jnp.asarray(ob), sh)

    got = planned_lookup(
        p, placed, {"bw": ibs}, offsets={"bw": obs}, mesh=m,
    )["bw"]
    want = embedding_lookup_csr(
        table, jnp.asarray(vals), jnp.asarray(offs), backend="xla"
    )
    np.testing.assert_allclose(
        np.asarray(got).reshape(B, W), np.asarray(want),
        rtol=1e-5, atol=1e-5,
    )

    gys = jax.device_put(
        gy, jax.sharding.NamedSharding(
            m, jax.sharding.PartitionSpec("model", "data")
        ),
    )
    new = planned_sgd_update(
        p, placed, {"bw": ibs}, {"bw": gys}, offsets={"bw": obs},
        mesh=m, lr=0.1,
    )["bw"]
    want_t = sgd_sparse_update(
        table, jnp.asarray(vals), gy, lr=0.1, offsets=jnp.asarray(offs)
    )
    np.testing.assert_allclose(
        np.asarray(new)[:V], np.asarray(want_t), rtol=1e-4, atol=1e-5
    )

    accums = planned_adagrad_init(p, placed, m)
    new_t, new_a = planned_adagrad_update(
        p, placed, accums, {"bw": ibs}, {"bw": gys},
        offsets={"bw": obs}, mesh=m, lr=0.1,
    )
    want_t2, want_a = rowwise_adagrad_sparse_update(
        table, jnp.zeros((V,), jnp.float32), jnp.asarray(vals), gy,
        lr=0.1, offsets=jnp.asarray(offs),
    )
    np.testing.assert_allclose(
        np.asarray(new_t["bw"])[:V], np.asarray(want_t2),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_a["bw"])[:V], np.asarray(want_a),
        rtol=1e-4, atol=1e-5,
    )


def test_plan_hybrid_wins_over_grid():
    """Measured skew evidence (head-hit rate) beats grid: hybrid routes
    a fraction of the traffic, grid always routes all of it."""
    cfg = TableConfig("t", 100_000, 256, hotness=4)
    p = plan(
        [cfg], 4, batch=65536, cost=GRID_COST,
        head_hit_rate={"t": 0.9}, grid_ok=True, col_shards=2,
        hot_bytes_total=2048 * 256 * 4,
    )
    assert p.tables["t"].placement == "hybrid"
    # without the skew evidence the same table goes grid
    p2 = plan(
        [cfg], 4, batch=65536, cost=GRID_COST,
        grid_ok=True, col_shards=2,
    )
    assert p2.tables["t"].placement == "grid_sharded"
