#!/usr/bin/env python
"""Host-offloaded table benchmark: prepare rate + end-to-end step time.

Two halves:

* ``--host-only``: the host `prepare` path (dedupe + tail-row gather) —
  native C++ vs numpy — in rows/s and batches/s. This is the piece that
  must outrun the device step time for offloading to be free; it runs
  anywhere (no chip needed).
* full mode (on the chip): lookup + sparse-SGD step latency of the
  offloaded table vs a device-resident table at the same shapes, with
  the prepare overlapped via the input pipeline.

    python benchmarks/offload_benchmark.py [--host-only]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_host(V, hot, W, B, H, alpha, iters=20):
    from cuembed_tpu import native
    from cuembed_tpu.utils.datagen import PowerLawGenerator

    rng = np.random.default_rng(0)
    tail = rng.standard_normal((V - hot, W)).astype(np.float32)
    gen = PowerLawGenerator(V - 1, H, alpha, seed=7)
    batches = [gen.sample(B).astype(np.int32) for _ in range(iters)]
    cap = max(
        np.unique(b[b >= hot]).size for b in batches
    )
    cap = -(-cap // 64) * 64

    has_native = native.AVAILABLE and native._HAS_OFFLOAD

    def run(use_native):
        if use_native and not has_native:
            return None, 0
        # monkeypatch-free: call the wrapper (native when built) or the
        # numpy fallback via a temporary flag flip
        saved = native._HAS_OFFLOAD
        native._HAS_OFFLOAD = use_native and saved
        try:
            t0 = time.perf_counter()
            k = 0
            for b in batches:
                out = native.offload_prepare(b, hot, tail, cap)
                k += out[3].size
            dt = time.perf_counter() - t0
        finally:
            native._HAS_OFFLOAD = saved
        return dt, k

    for label, use in (("numpy ", False), ("native", True)):
        if label == "native" and not has_native:
            print("native: library not built or stale (make -C native)")
            continue
        dt, k = run(use)
        nnz = B * H * iters
        print(
            f"prepare[{label}] V={V} hot={hot} W={W} B={B} H={H} "
            f"a={alpha}: {dt / iters * 1e3:7.2f} ms/batch "
            f"({nnz / dt / 1e6:6.1f} M pos/s, "
            f"{k / dt / 1e6:5.1f} M uniq-cold rows/s, cap {cap})"
        )


def bench_device(V, hot, W, B, H, alpha, iters=10):
    import jax
    import jax.numpy as jnp

    from cuembed_tpu import embedding_lookup
    from cuembed_tpu.offload import HostOffloadTable
    from cuembed_tpu.utils.datagen import PowerLawGenerator
    from cuembed_tpu.utils.pipeline import InputPipeline

    rng = np.random.default_rng(1)
    table = rng.standard_normal((V, W)).astype(np.float32)
    gen = PowerLawGenerator(V - 1, H, alpha, seed=7)
    batches = [gen.sample(B).astype(np.int32) for _ in range(iters + 2)]
    cap = -(-max(np.unique(b[b >= hot]).size for b in batches) // 64) * 64
    off = HostOffloadTable(table, hot, cold_cap=cap)

    it = iter(batches)
    with InputPipeline(lambda: off.prepare(next(it)), depth=2) as pipe:
        out = off.lookup(pipe.get())  # warm-up / compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = off.lookup(pipe.get())
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
    print(
        f"offload lookup (pipelined): {dt * 1e3:7.2f} ms/batch "
        f"({B * H / dt / 1e6:6.1f} M lookups/s)"
    )

    # device-resident comparison (fits-in-HBM case)
    tdev = jax.block_until_ready(jnp.asarray(table))
    idx = jnp.asarray(batches[0])
    ref = jax.block_until_ready(embedding_lookup(tdev, idx))
    t0 = time.perf_counter()
    for i in range(iters):
        ref = embedding_lookup(tdev, jnp.asarray(batches[i % len(batches)]))
    jax.block_until_ready(ref)
    print(
        f"resident lookup           : "
        f"{(time.perf_counter() - t0) / iters * 1e3:7.2f} ms/batch"
    )


def _prepare_ms(V, hot, W, B, H, alpha, iters=8):
    """Pipelined-host cost: native prepare ms/batch (numpy if unbuilt)."""
    from cuembed_tpu import native
    from cuembed_tpu.utils.datagen import PowerLawGenerator

    rng = np.random.default_rng(2)
    tail = rng.standard_normal((V - hot, W)).astype(np.float32)
    gen = PowerLawGenerator(V - 1, H, alpha, seed=9)
    batches = [gen.sample(B).astype(np.int32) for _ in range(iters)]
    cap = -(-max(np.unique(b[b >= hot]).size for b in batches) // 64) * 64
    native.offload_prepare(batches[0], hot, tail, cap)  # touch/warm
    t0 = time.perf_counter()
    for b in batches:
        native.offload_prepare(b, hot, tail, cap)
    return (time.perf_counter() - t0) / iters * 1e3, cap


def _device_step_ms(V, hot, W, B, H, alpha, cap, iters=6):
    """Offloaded lookup+SGD step ms/batch with prepare pipelined."""
    import jax

    from cuembed_tpu.offload import HostOffloadTable
    from cuembed_tpu.utils.datagen import PowerLawGenerator
    from cuembed_tpu.utils.pipeline import InputPipeline

    rng = np.random.default_rng(3)
    table = rng.standard_normal((V, W)).astype(np.float32)
    gen = PowerLawGenerator(V - 1, H, alpha, seed=9)
    batches = [gen.sample(B).astype(np.int32) for _ in range(iters + 2)]
    off = HostOffloadTable(table, hot, cold_cap=cap)
    gy = np.random.default_rng(4).standard_normal((B, W)).astype(np.float32)
    import jax.numpy as jnp

    gy = jnp.asarray(gy)
    it = iter(batches)
    with InputPipeline(lambda: off.prepare(next(it)), depth=2) as pipe:
        b = pipe.get()
        jax.block_until_ready(off.lookup(b))
        off.sgd_update(b, gy, lr=0.01)  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            b = pipe.get()
            out = off.lookup(b)
            off.sgd_update(b, gy, lr=0.01)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3


def sweep(args):
    """Break-even curve: pipelined host prepare vs device step.

    Offload is 'free' when the host prepare (run on the input-pipeline
    thread, depth-2 pipelined) finishes inside the device step; the
    PREP/STEP ratio column makes the break-even explicit. Rows with
    ratio <= 1.0 hide the host work entirely; above 1.0 the host is the
    bottleneck and the step rate degrades by that factor.
    """
    import csv as _csv

    on_chip = not args.host_only
    W, H, alpha, hot = args.width, args.hotness, args.alpha, args.hot
    out = []
    tails = [int(x) for x in args.tails.split(",")]
    batches = [int(x) for x in args.batches.split(",")]
    print(f"offload break-even sweep: W={W} H={H} alpha={alpha} hot={hot}")
    print(f"{'tail_rows':>10} {'batch':>7} {'prep_ms':>8} {'step_ms':>8} "
          f"{'ratio':>6}  verdict")
    for tail_rows in tails:
        V = hot + tail_rows
        for B in batches:
            prep, cap = _prepare_ms(V, hot, W, B, H, alpha)
            step = (
                _device_step_ms(V, hot, W, B, H, alpha, cap)
                if on_chip else float("nan")
            )
            ratio = prep / step if step == step else float("nan")
            verdict = (
                "-" if ratio != ratio
                else ("hidden (free)" if ratio <= 1.0 else "host-bound")
            )
            print(f"{tail_rows:>10} {B:>7} {prep:8.2f} {step:8.2f} "
                  f"{ratio:6.2f}  {verdict}")
            out.append((tail_rows, B, W, H, alpha, hot, cap,
                        round(prep, 3), round(step, 3)))
    if args.csv:
        with open(args.csv, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["tail_rows", "batch", "width", "hotness", "alpha",
                        "hot_rows", "cold_cap", "prepare_ms", "step_ms"])
            w.writerows(out)
        print(f"wrote {args.csv}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host-only", action="store_true")
    p.add_argument("--sweep", action="store_true",
                   help="batch x tail-size break-even table (see sweep())")
    p.add_argument("--tails", type=str,
                   default="1000000,4000000,16000000",
                   help="comma list of tail row counts for --sweep")
    p.add_argument("--batches", type=str, default="8192,32768,65536",
                   help="comma list of batch sizes for --sweep")
    p.add_argument("--csv", type=str, default="")
    p.add_argument("--rows", type=int, default=2_000_000)
    p.add_argument("--hot", type=int, default=262_144)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--hotness", type=int, default=8)
    p.add_argument("--alpha", type=float, default=1.15)
    args = p.parse_args()
    if args.sweep:
        sweep(args)
        return
    bench_host(
        args.rows, args.hot, args.width, args.batch, args.hotness,
        args.alpha,
    )
    if not args.host_only:
        bench_device(
            args.rows, args.hot, args.width, args.batch, args.hotness,
            args.alpha,
        )


if __name__ == "__main__":
    main()
