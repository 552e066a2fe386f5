"""Framework parity vs torch.nn.EmbeddingBag (CPU).

The analog of the reference's ``examples/pytorch/cuembed_test.py``:
forward parity is exact-tolerance, backward compares dense table
gradients. Unlike the reference (atomics => ``allclose`` only,
``cuembed_test.py:33``), our backward is deterministic, but torch's CPU
reduction order differs, so tolerances stay float-level."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cuembed_tpu import CombineMode, embedding_lookup, embedding_lookup_csr


@pytest.mark.parametrize("mode,tmode", [
    (CombineMode.SUM, "sum"),
    (CombineMode.MEAN, "mean"),
])
def test_fixed_hotness_forward_backward(mode, tmode):
    rng = np.random.default_rng(0)
    V, W, B, H = 500, 32, 64, 8
    table_np = rng.standard_normal((V, W)).astype(np.float32)
    idx_np = rng.integers(0, V, (B, H)).astype(np.int64)
    gy_np = rng.standard_normal((B, W)).astype(np.float32)

    # torch
    bag = torch.nn.EmbeddingBag(V, W, mode=tmode)
    with torch.no_grad():
        bag.weight.copy_(torch.from_numpy(table_np))
    out_t = bag(torch.from_numpy(idx_np))
    out_t.backward(torch.from_numpy(gy_np))
    grad_t = bag.weight.grad.numpy()

    # ours
    out_j = embedding_lookup(
        jnp.asarray(table_np), idx_np.astype(np.int32), mode=mode,
        backend="xla",
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.detach().numpy(), rtol=1e-5, atol=1e-5
    )

    def loss(t):
        return jnp.sum(
            embedding_lookup(t, idx_np.astype(np.int32), mode=mode,
                             backend="xla")
            * jnp.asarray(gy_np)
        )

    grad_j = jax.grad(loss)(jnp.asarray(table_np))
    np.testing.assert_allclose(np.asarray(grad_j), grad_t, rtol=1e-4, atol=1e-5)


def test_csr_weighted_sum_matches_torch():
    rng = np.random.default_rng(1)
    V, W, B = 300, 16, 32
    table_np = rng.standard_normal((V, W)).astype(np.float32)
    hots = rng.integers(0, 6, B)
    offsets = np.concatenate([[0], np.cumsum(hots)]).astype(np.int64)
    nnz = int(offsets[-1])
    flat = rng.integers(0, V, nnz).astype(np.int64)
    w = rng.standard_normal(nnz).astype(np.float32)

    bag = torch.nn.EmbeddingBag(V, W, mode="sum")
    with torch.no_grad():
        bag.weight.copy_(torch.from_numpy(table_np))
    # torch takes offsets of shape [B] (start of each bag)
    out_t = bag(
        torch.from_numpy(flat),
        torch.from_numpy(offsets[:-1]),
        per_sample_weights=torch.from_numpy(w),
    )

    out_j = embedding_lookup_csr(
        jnp.asarray(table_np),
        flat.astype(np.int32),
        offsets.astype(np.int32),
        jnp.asarray(w),
        backend="xla",
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.detach().numpy(), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("layout", ["padded", "packed", "raw"])
def test_from_torch_parity(layout):
    """EmbeddingBag.from_torch reproduces nn.EmbeddingBag outputs."""
    torch = pytest.importorskip("torch")
    from cuembed_tpu.models.embedding_bag import EmbeddingBag

    torch.manual_seed(3)
    V, W, B, H = 128, 32, 16, 4
    tm = torch.nn.EmbeddingBag(V, W, mode="mean")
    bag, table = EmbeddingBag.from_torch(tm, layout=layout)
    assert bag.mode == CombineMode.MEAN
    idx = np.random.default_rng(4).integers(0, V, (B, H)).astype(np.int64)
    want = tm(
        torch.from_numpy(idx.reshape(-1)),
        torch.arange(0, B * H, H),
    ).detach().numpy()
    got = np.asarray(bag.apply(table, jnp.asarray(idx.astype(np.int32))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # round trip back to torch weights
    np.testing.assert_allclose(
        bag.export_table(table),
        tm.weight.detach().numpy(),
        rtol=1e-6, atol=1e-7,
    )


def test_from_torch_rejects_max_mode():
    torch = pytest.importorskip("torch")
    from cuembed_tpu.models.embedding_bag import EmbeddingBag

    tm = torch.nn.EmbeddingBag(8, 4, mode="max")
    with pytest.raises(ValueError, match="max"):
        EmbeddingBag.from_torch(tm)


def test_import_table_rejects_wrong_shape():
    from cuembed_tpu.models.embedding_bag import EmbeddingBag

    bag = EmbeddingBag(8, 4)
    with pytest.raises(ValueError, match="expected"):
        bag.import_table(np.zeros((8, 5), np.float32))


def test_from_torch_bfloat16():
    """bf16 torch modules import exactly (bf16 -> fp32 is lossless) and
    keep their storage dtype."""
    torch = pytest.importorskip("torch")
    from cuembed_tpu.models.embedding_bag import EmbeddingBag

    torch.manual_seed(5)
    tm = torch.nn.EmbeddingBag(64, 16, mode="sum", dtype=torch.bfloat16)
    bag, table = EmbeddingBag.from_torch(tm)
    assert bag.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        bag.export_table(table).astype(np.float32),
        tm.weight.detach().float().numpy(),
    )
