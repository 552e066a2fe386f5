"""Input pipeline tests: remap application, ordering, error surfacing."""

import numpy as np
import pytest

from cuembed_tpu.utils.pipeline import InputPipeline


def test_pipeline_remaps_and_orders():
    rng = np.random.default_rng(0)
    remap = rng.permutation(100).astype(np.int32)
    batches = [rng.integers(0, 100, (4, 3)).astype(np.int32) for _ in range(5)]
    it = iter(batches)
    with InputPipeline(lambda: next(it), remap=remap, depth=2) as pipe:
        for want_raw in batches:
            got = pipe.get()
            np.testing.assert_array_equal(got, remap[want_raw])


def test_pipeline_dict_batches_partial_remap():
    rng = np.random.default_rng(1)
    remap = rng.permutation(50).astype(np.int32)
    batch = {
        "a": rng.integers(0, 50, (4,)).astype(np.int32),
        "b": rng.integers(0, 50, (4,)).astype(np.int32),
    }
    with InputPipeline(
        lambda: batch, remap={"a": remap}, depth=1
    ) as pipe:
        got = pipe.get()
        np.testing.assert_array_equal(got["a"], remap[batch["a"]])
        np.testing.assert_array_equal(got["b"], batch["b"])


def test_pipeline_surfaces_source_errors():
    def boom():
        raise RuntimeError("source died")

    with InputPipeline(boom, depth=1) as pipe:
        with pytest.raises(RuntimeError, match="source died"):
            pipe.get(timeout=5.0)
