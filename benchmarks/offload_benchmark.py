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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host-only", action="store_true")
    p.add_argument("--rows", type=int, default=2_000_000)
    p.add_argument("--hot", type=int, default=262_144)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--hotness", type=int, default=8)
    p.add_argument("--alpha", type=float, default=1.15)
    args = p.parse_args()
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
