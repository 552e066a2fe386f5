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
