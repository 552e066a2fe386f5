"""Timing-helper correctness: the measurement layer itself.

Round 4 found two defects in how this repo times device work (both
measured on the real chip, docs/PERF_NOTES.md §timing):

1. per-RPC chained timing carries ~1 ms/dispatch tunnel overhead, which
   inflated every sub-ms sweep point (the round-2 width-32 rows were
   10-40x high) — fixed by ``fori_chain_time`` (whole chain on device
   in ONE executable; the slope between two chain lengths cancels RTT
   exactly) and the ``robust_chain_time`` min(rpc, fori) policy;
2. a scalar ``out[0, 0]`` carry probe lets XLA dead-code-eliminate the
   measured work (a 256 MB gather timed 0.00 ms on the CPU backend) —
   fixed by carrying the FULL output array as chain state
   (``bump_from`` / ``full_carry_x0``).

These tests pin the mechanics on CPU; magnitudes are asserted only
where they are backend-independent (DCE resistance shows up as a
measurable floor even on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuembed_tpu.utils.benchmarking import (
    bump_from,
    carry_probe,
    chain_time,
    fori_chain_time,
    full_carry_x0,
    opaque_bump,
    robust_chain_time,
    stream_rate_gbps,
)


def test_opaque_bump_is_runtime_zero():
    assert int(opaque_bump(jnp.float32(0.0))) == 0
    assert int(opaque_bump(jnp.float32(1e20))) == 0
    assert opaque_bump(jnp.float32(3.0)).dtype == jnp.int32


def test_bump_from_accepts_scalar_and_array():
    assert int(bump_from(jnp.float32(2.0))) == 0
    assert int(bump_from(jnp.zeros((4, 8)))) == 0


def test_fori_chain_time_positive_and_operandized():
    table = jnp.asarray(
        np.random.default_rng(0).standard_normal((512, 64)),
        dtype=jnp.float32,
    )
    idx = jnp.arange(128, dtype=jnp.int32) % 512

    def step(c, table, idx):
        i, dep = c
        out = table[idx + bump_from(dep)]
        return (i + 1, out)

    x0 = (jnp.int32(0), jnp.zeros((128, 64), jnp.float32))
    dt = fori_chain_time(step, x0, operands=(table, idx), k_lo=2, k_hi=8,
                         repeats=2)
    assert dt > 0

    st = fori_chain_time(step, x0, operands=(table, idx), k_lo=2, k_hi=8,
                         repeats=2, return_stats=True)
    assert set(st) == {"min", "median", "max", "degenerate"}
    # min<=median<=max is NOT guaranteed for degenerate (sub-µs) steps:
    # each slope is clamped at 1e-9 independently, so a noise-negative
    # median can clamp below the min. Positivity is the contract; the
    # 'degenerate' flag (round 5) marks a clamped slope so consumers
    # re-measure instead of committing garbage.
    assert all(v > 0 for k, v in st.items() if k != "degenerate")


def test_fori_chain_time_requires_float_leaf():
    def step(c):
        return c + 1

    with pytest.raises(ValueError, match="float leaf"):
        fori_chain_time(step, jnp.int32(0), k_lo=1, k_hi=2)


def test_full_carry_x0_discovers_output_shape():
    table = jnp.ones((100, 32), jnp.bfloat16)
    idx = jnp.zeros((16,), jnp.int32)

    def step(c, table, idx):
        i, dep = c
        return (i + 1, table[idx + bump_from(dep)])

    x0 = full_carry_x0(step, table, idx)
    assert x0[1].shape == (16, 32)
    assert x0[1].dtype == jnp.bfloat16


def test_robust_chain_time_matches_chain_time_contract():
    def step(c, v):
        i, dep = c
        return (i + 1, v * 1.0 + bump_from(dep))

    v = jnp.ones((64,), jnp.float32)
    x0 = (jnp.int32(0), jnp.zeros((64,), jnp.float32))
    r = robust_chain_time(step, x0, operands=(v,), k_lo=1, k_hi=4,
                          repeats=2, return_stats=True)
    # min <= max is NOT guaranteed for noise-dominated sub-µs steps (the
    # reductions are computed independently over noisy lo/hi lists);
    # positivity and the stats contract are.
    assert r["min"] > 0 and r["max"] > 0 and r["median"] > 0
    assert "degenerate" in r
    # scalar form
    s = robust_chain_time(step, x0, operands=(v,), k_lo=1, k_hi=4,
                          repeats=2)
    assert isinstance(s, float)


def test_full_carry_defeats_dce():
    """The DCE regression this round fixed: through a scalar probe, a
    large gather measures ~0 because XLA slices it to one row; through
    a full-output carry it must do the work. On any backend the full
    carry must measure materially slower than the probed one for a
    gather whose output is ~100 MB."""
    V, B, W = 4096, 262_144, 128  # out = 128 MB f32
    table = jnp.asarray(
        np.random.default_rng(1).standard_normal((V, W)), jnp.float32
    )
    idx = jnp.asarray(
        np.random.default_rng(2).integers(0, V, B).astype(np.int32)
    )

    def probed(c, table, idx):
        i, dep = c
        out = table[idx + bump_from(dep)]
        return (i + 1, out[0, 0] * 1.0)

    def full(c, table, idx):
        i, dep = c
        out = table[idx + bump_from(dep)]
        return (i + 1, out)

    t_probe = fori_chain_time(
        probed, (jnp.int32(0), jnp.float32(0)), operands=(table, idx),
        k_lo=2, k_hi=16, repeats=2,
    )
    t_full = fori_chain_time(
        full, full_carry_x0(full, table, idx), operands=(table, idx),
        k_lo=2, k_hi=16, repeats=2,
    )
    # DCE'd probe collapses to ~0; the honest step moves >=128 MB.
    assert t_full > 5 * t_probe, (t_probe, t_full)

    # carry_probe (sum-of-squares reduction) must behave like the full
    # carry — every element feeds the probe, so the gather cannot be
    # narrowed — while keeping the carried state scalar (the full carry
    # OOM'd 512 MB backward points on-chip). The reduce may add
    # overhead (unfused on CPU) but can never be faster than half the
    # honest step.
    def sos_probed(c, table, idx):
        i, dep = c
        out = table[idx + bump_from(dep)]
        return (i + 1, carry_probe(out))

    t_sos = fori_chain_time(
        sos_probed, (jnp.int32(0), jnp.float32(0)),
        operands=(table, idx), k_lo=2, k_hi=16, repeats=2,
    )
    assert t_sos > 5 * t_probe, (t_probe, t_sos)
    assert t_sos > 0.5 * t_full, (t_full, t_sos)


def test_carry_probe_scatter_not_eliminated():
    """reduce(scatter) must not degrade to reduce(updates): sum of
    SQUARES over a colliding scatter-add differs from the sum over its
    updates (cross terms), so no rewrite exists — and the probe value
    itself witnesses the collisions."""
    upd = jnp.ones((6, 4), jnp.float32)
    rows = jnp.asarray([0, 0, 1, 2, 2, 2], jnp.int32)
    g = jnp.zeros((4, 4), jnp.float32).at[rows].add(upd)
    # rows 0,1,2 get 2,1,3 hits -> sum of squares = 4*(4+1+9) = 56
    assert float(carry_probe(g)) == 56.0


def test_carry_probe_scalar_and_pytree():
    out = jnp.ones((8, 16), jnp.bfloat16)
    p = carry_probe(out)
    assert p.shape == () and p.dtype == jnp.float32 and float(p) == 128.0
    p2 = carry_probe((jnp.full((4,), 7, jnp.int32), jnp.ones((2,))))
    assert float(p2) == 4 * 49 + 2


def test_stream_rate_runs():
    r = stream_rate_gbps(8)
    assert r > 0


def test_chain_time_basic():
    def step(x):
        return x + 1.0

    dt = chain_time(step, jnp.float32(0), k_lo=1, k_hi=4, repeats=2)
    assert dt > 0
