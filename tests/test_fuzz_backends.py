"""Randomized cross-backend equivalence fuzz.

Draws random configurations (shapes, modes, weights, CSR, dtypes,
tiered configs) and checks every available lowering agrees with the XLA
baseline. The deterministic seed makes failures reproducible.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cuembed_tpu import CombineMode, embedding_lookup, embedding_lookup_csr
from cuembed_tpu.ops.narrow import narrow_lookup, pack_narrow, packing_factor
from cuembed_tpu.ops.tiered import TieredConfig

MODES = [CombineMode.SUM, CombineMode.MEAN, CombineMode.CONCAT]


@pytest.mark.parametrize("trial", range(20))
def test_fuzz_tiered_and_narrow_match_xla(trial):
    rng = np.random.default_rng(1000 + trial)
    V = int(rng.integers(64, 2000))
    W = int(rng.choice([16, 32, 64, 128, 256]))
    B = int(rng.integers(1, 65))
    H = int(rng.integers(1, 17))
    mode = MODES[rng.integers(0, 3)]
    weighted = bool(rng.integers(0, 2)) and mode == CombineMode.SUM
    csr = bool(rng.integers(0, 2)) and mode != CombineMode.CONCAT
    dtype = [jnp.float32, jnp.bfloat16][rng.integers(0, 2)]

    table = jnp.asarray(
        rng.standard_normal((V, W)).astype(np.float32)
    ).astype(dtype)

    if csr:
        hots = rng.integers(0, H + 1, B)
        offsets = jnp.asarray(
            np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
        )
        cap = int(offsets[-1]) + int(rng.integers(0, 5))
        idx = jnp.asarray(rng.integers(0, V, max(cap, 1)).astype(np.int32))
        w = (
            jnp.asarray(rng.standard_normal(max(cap, 1)).astype(np.float32))
            if weighted
            else None
        )
        base = embedding_lookup_csr(
            table, idx, offsets, w, mode=mode, backend="xla"
        )
    else:
        offsets = None
        idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
        w = (
            jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
            if weighted
            else None
        )
        base = embedding_lookup(table, idx, w, mode=mode, backend="xla")

    tol = 5e-2 if dtype == jnp.bfloat16 else 3e-5

    # tiered (when applicable)
    if mode != CombineMode.CONCAT:
        hot = int(rng.integers(8, V))
        e = (
            H * max(1, int(rng.integers(1, 9)))
            if not csr
            else int(rng.choice([16, 64, 128]))
        )
        cfg = TieredConfig(
            hot_rows=hot,
            chunk_elems=e,
            cold_slots=int(rng.integers(4, e + 1)),
            mxu_head_rows=int(rng.integers(0, min(129, hot + 1))),
            mid_slots=int(rng.integers(4, e + 1)),
            # exercise the scatter-free CSR combine about half the time
            # (0 = legacy 2-tier path; tiny caps hit the span fallback)
            csr_chunk_samples=int(rng.choice([0, 4, 16, e])),
        )
        if csr:
            got = embedding_lookup_csr(
                table, idx, offsets, w, mode=mode,
                backend="tiered", tiered_cfg=cfg,
            )
        else:
            got = embedding_lookup(
                table, idx, w, mode=mode, backend="tiered", tiered_cfg=cfg
            )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(base, np.float32),
            rtol=tol, atol=tol,
        )

    # narrow packed layout (when applicable)
    if packing_factor(W) > 1 and dtype == jnp.float32:
        got = narrow_lookup(
            pack_narrow(table), V, W, idx, w, offsets, mode=mode
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(base, np.float32),
            rtol=tol, atol=tol,
        )
        # dispatch-level: auto routes width<128 through the packed path
        for be in ("auto", "narrow"):
            if csr:
                got = embedding_lookup_csr(
                    table, idx, offsets, w, mode=mode, backend=be
                )
            else:
                got = embedding_lookup(table, idx, w, mode=mode, backend=be)
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(base, np.float32),
                rtol=tol, atol=tol,
            )


@pytest.mark.parametrize("trial", range(10))
def test_fuzz_fused_and_offload_match_xla(trial):
    """Random table groups: the fused lookup and the host-offloaded
    table must both reproduce the per-table XLA baseline."""
    from cuembed_tpu.fused import fuse_tables, fused_lookup
    from cuembed_tpu.offload import HostOffloadTable

    rng = np.random.default_rng(3000 + trial)
    T = int(rng.integers(2, 5))
    W = int(rng.choice([16, 32, 64]))
    B = int(rng.integers(2, 49))
    mode = [CombineMode.SUM, CombineMode.MEAN][rng.integers(0, 2)]
    weighted = bool(rng.integers(0, 2)) and mode == CombineMode.SUM
    names = [f"t{i}" for i in range(T)]
    sizes = {n: int(rng.integers(32, 1500)) for n in names}
    hot = {n: int(rng.integers(1, 9)) for n in names}
    tables = {
        n: jnp.asarray(rng.standard_normal((sizes[n], W)).astype(np.float32))
        for n in names
    }
    idx = {
        n: jnp.asarray(
            rng.integers(0, sizes[n], (B, hot[n])).astype(np.int32)
        )
        for n in names
    }
    w = (
        {
            n: jnp.asarray(
                rng.standard_normal((B, hot[n])).astype(np.float32)
            )
            for n in names
        }
        if weighted
        else None
    )
    base = {
        n: embedding_lookup(
            tables[n], idx[n], None if w is None else w[n],
            mode=mode, backend="xla",
        )
        for n in names
    }

    # fused group
    fused, spec = fuse_tables(tables, hot)
    got = fused_lookup(fused, spec, idx, w, mode=mode, backend="xla")
    for n in names:
        np.testing.assert_allclose(
            np.asarray(got[n]), np.asarray(base[n]),
            rtol=1e-5, atol=1e-5, err_msg=f"fused {n}",
        )

    # host-offloaded single table (first of the group)
    n0 = names[0]
    if sizes[n0] >= 8:
        hrows = max(1, sizes[n0] // int(rng.integers(2, 8)))
        off = HostOffloadTable(
            np.asarray(tables[n0]), hrows, cold_cap=B * hot[n0]
        )
        batch = off.prepare(
            np.asarray(idx[n0]), None if w is None else np.asarray(w[n0])
        )
        got0 = off.lookup(batch, mode=mode)
        np.testing.assert_allclose(
            np.asarray(got0), np.asarray(base[n0]),
            rtol=1e-5, atol=1e-5, err_msg="offload",
        )
