"""Sweep measurement-hygiene policy (round-5).

Round 4 committed physically impossible rows (0.00 ms elapsed,
262,144 GB/s = app_bytes / 1e-9 s — the degenerate-slope clamp leaking
straight into the CSV). These tests pin the policy that prevents it:

* a chain-time estimate at the 1e-9 clamp is marked ``degenerate`` and
  never wins ``robust_chain_time``'s min(),
* ``measure_until_plausible`` re-measures implausible points and flags
  the survivors so the sweep emitter can refuse them,
* every committed sweep CSV row is physically plausible
  (``benchmarks/check_sweep.py``).
"""

import csv
import io
import os
import subprocess
import sys

import pytest

from cuembed_tpu.utils.benchmarking import (
    DEGENERATE_SLOPE_S,
    _slope_stats,
    measure_until_plausible,
    plausible_floor_s,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_slope_stats_degenerate_flag():
    ok = _slope_stats(1e-3, 1.2e-3, 2e-3)
    assert not ok["degenerate"]
    clamped = _slope_stats(DEGENERATE_SLOPE_S, 1.2e-3, 2e-3)
    assert clamped["degenerate"]
    clamped_med = _slope_stats(1e-3, DEGENERATE_SLOPE_S, 2e-3)
    assert clamped_med["degenerate"]


def test_plausible_floor():
    # 262,144 app bytes at 819 GB/s peak: nothing real finishes faster
    # than ~0.26 us even with the 1.25x safety margin.
    floor = plausible_floor_s(262144, 819.0)
    assert 2e-7 < floor < 3e-7
    # the round-4 garbage rows (1e-9 s) sit far below it
    assert DEGENERATE_SLOPE_S < floor


def _stats(median, degenerate=False):
    return {
        "min": median, "median": median, "max": median,
        "degenerate": degenerate,
    }


def test_measure_until_plausible_retries_then_accepts():
    seq = [_stats(1e-9, degenerate=True), _stats(5e-4)]
    calls = []

    def measure():
        calls.append(1)
        return seq[min(len(calls) - 1, len(seq) - 1)]

    st = measure_until_plausible(measure, floor_s=1e-6)
    assert len(calls) == 2
    assert not st["implausible"]
    assert st["median"] == 5e-4


def test_measure_until_plausible_flags_persistent_garbage():
    calls = []

    def measure():
        calls.append(1)
        return _stats(1e-9, degenerate=True)

    st = measure_until_plausible(measure, floor_s=1e-6, retries=2)
    assert len(calls) == 3  # initial + 2 retries
    assert st["implausible"]


def test_measure_until_plausible_floor_without_degenerate():
    # A non-degenerate but faster-than-light median still re-measures:
    # 0.1 us for 1 MB of app traffic is physically impossible.
    floor = plausible_floor_s(1_000_000, 819.0)
    st = measure_until_plausible(lambda: _stats(1e-7), floor_s=floor)
    assert st["implausible"]


# ---------------------------------------------------------------------------
# Committed-artifact checks
# ---------------------------------------------------------------------------

SWEEP_CSVS = [
    "benchmarks/results_v5e_r4.csv",
    "benchmarks/results_v5e_r4_csr.csv",
]


@pytest.mark.parametrize("rel", SWEEP_CSVS)
def test_committed_sweep_rows_plausible(rel):
    """No committed sweep row may be physically impossible.

    Uses the same checker the runbook runs (benchmarks/check_sweep.py):
    elapsed > 0, bandwidth <= 1.25x HBM peak, no '!impossible' flags.
    """
    path = os.path.join(REPO, rel)
    if not os.path.exists(path):
        pytest.skip(f"{rel} not present")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks/check_sweep.py"),
         path],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, f"{rel} failed plausibility:\n{r.stdout}"


def test_check_sweep_catches_garbage():
    """The checker itself must reject the round-4 failure modes."""
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    try:
        from check_sweep import check_rows
    finally:
        sys.path.pop(0)

    header = (
        "num_categories,batch_size,hotness,alpha,embed_width,combine_mode,"
        "is_csr,is_weighted,compressed_grad,skip_grad_init,name,"
        "iterations,elapsed_time_ms,avg_time_ms,algo_bw_l2,algo_bw_dram"
    )
    good = "1000000,1024,1,0.0,32,kSum,0,0,1,1,forward,20,0.2200,0.0110,24.12,0.00"
    zero_ms = "1000000,1024,1,1.05,32,kSum,0,0,1,1,forward,20,0.00,0.00,262144.00,0.00"
    over_peak = "1000000,1024,1,1.15,128,kSum,0,0,1,1,transpose,20,0.0010,0.0001,16384.00,16384.00"
    flagged = "1000000,1024,1,1.15,32,kSum,0,0,1,1,forward!impossible,20,0.0001,0.0000,99.00,0.00"

    def probs(*rows):
        f = io.StringIO("\n".join((header,) + rows) + "\n")
        return check_rows(csv.DictReader(f), peak_gbps=819.0)

    assert probs(good) == []
    assert len(probs(zero_ms)) == 1
    assert len(probs(over_peak)) == 1
    assert len(probs(flagged)) == 1
    assert len(probs(good, zero_ms, over_peak, flagged)) == 3
