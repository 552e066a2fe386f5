"""Benchmark-harness smoke tests: every CLI runs end-to-end at toy size.

The harnesses are how every chip window is spent (benchmarks/
run_onchip_r3.sh); a crash found on the chip wastes the window. These
run each one in-process (runpy, tiny shapes) on CPU — they validate
plumbing and output shape, not performance.
"""

import os
import runpy
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, argv, capsys):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(os.path.join(ROOT, script), run_name="__main__")
    except SystemExit as e:  # a clean CLI exit is not a failure
        assert not e.code, f"{script} exited {e.code}"
    finally:
        sys.argv = old
    return capsys.readouterr()


def test_bench_quick(capsys):
    out = _run(
        "bench.py",
        ["--quick", "--num-categories", "100000", "--batch", "1024",
         "--hotness", "8", "--width", "128"],
        capsys,
    )
    assert '"metric": "forward_lookup_app_bw"' in out.out


def test_bench_csr(capsys):
    out = _run(
        "bench.py",
        ["--csr", "--num-categories", "100000", "--batch", "1024",
         "--hotness", "8", "--width", "128", "--dtype", "float32"],
        capsys,
    )
    assert '"metric": "forward_lookup_csr_app_bw"' in out.out


def test_fused_benchmark(capsys):
    out = _run(
        "benchmarks/fused_benchmark.py",
        ["--quick", "--tables", "3", "--rows", "1000", "--batch", "128"],
        capsys,
    )
    assert "fused" in out.out and "sgd" in out.out


def test_offload_benchmark_host_only(capsys):
    out = _run(
        "benchmarks/offload_benchmark.py",
        ["--host-only", "--rows", "50000", "--hot", "8192",
         "--batch", "512"],
        capsys,
    )
    assert "prepare[numpy ]" in out.out


def test_train_benchmark_chained(capsys):
    out = _run(
        "benchmarks/train_benchmark.py",
        ["--quick", "--chained", "--num-categories", "20000",
         "--batch", "256", "--hotness", "4", "--width", "64",
         "--iters", "1"],
        capsys,
    )
    assert "sparse" in out.out and "adagrad" in out.out


def test_sweep_summary_generator(tmp_path, capsys):
    csv = tmp_path / "r.csv"
    csv.write_text(
        "num_categories,batch_size,hotness,alpha,embed_width,combine_mode,"
        "is_csr,is_weighted,compressed_grad,skip_grad_init,name,iterations,"
        "elapsed_time_ms,avg_time_ms,algo_bw_l2,algo_bw_dram\n"
        "1000000,1024,16,1.15,128,kSum,0,0,1,1,forward,3,6.0,2.0,100.0,90.0\n"
        "1000000,1024,16,1.15,128,kSum,0,0,1,1,transpose,3,0.4,0.13,5.0,5.0\n"
        "1000000,1024,16,1.15,128,kSum,0,0,1,1,backward,3,3.2,1.1,50.0,40.0\n"
    )
    out = _run(
        "benchmarks/gen_sweep_summary.py", [str(csv)], capsys
    )
    assert "1M" in out.out  # fmt_cats renders 1000000 as 1M


def test_sweep_runner_quick_and_resume(tmp_path, capsys):
    """The chip-window workhorse must not break between windows: the
    --quick subset runs end-to-end on CPU and --resume skips completed
    configs instead of re-measuring them."""
    out = str(tmp_path / "sweep.csv")
    _run(
        "benchmarks/sweep_runner.py",
        ["--quick", "--no-gate", "--iters", "1", "--out", out],
        capsys,
    )
    rows = open(out).read().strip().splitlines()
    assert rows[0].startswith("num_categories,")
    n_rows = len(rows)
    assert n_rows > 1
    # resume: nothing left to do, the CSV must not grow
    second = _run(
        "benchmarks/sweep_runner.py",
        ["--quick", "--no-gate", "--iters", "1", "--out", out,
         "--resume"],
        capsys,
    )
    assert len(open(out).read().strip().splitlines()) == n_rows, second.out


def test_profile_train_quick(capsys):
    out = _run("benchmarks/profile_train.py", ["--quick"], capsys)
    assert "sgd" in out.out.lower()


def test_retune_headline_smoke(capsys):
    out = _run(
        "benchmarks/retune_headline.py", ["--smoke", "--iters", "2"],
        capsys,
    )
    assert "GB/s" in out.out


def test_offload_breakeven_sweep_host_only(tmp_path, capsys):
    csv = str(tmp_path / "be.csv")
    out = _run(
        "benchmarks/offload_benchmark.py",
        ["--sweep", "--host-only", "--hot", "4096", "--width", "32",
         "--batch", "256", "--hotness", "4",
         "--tails", "20000", "--batches", "256", "--csv", csv],
        capsys,
    )
    assert "break-even sweep" in out.out
    rows = open(csv).read().strip().splitlines()
    assert rows[0].startswith("tail_rows") and len(rows) == 2
