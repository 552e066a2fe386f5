#!/usr/bin/env python
"""Pin the opt-in Pallas kernels' flagship times as a tracked artifact.

The dispatch policy keeps the hand-written Pallas forward/backward
kernels opt-in because their scalar-core DMA issue rate (~30 ns/row
measured) loses to XLA's gather/scatter emitters (docs/PERF_NOTES.md
§in-kernel). That claim gates real decisions, so it must live in a
committed measurement, not prose: this harness times both Pallas
kernels against the XLA paths at a flagship-shaped point and prints ONE
JSON line for the round artifacts. A future chip/toolchain where the
Pallas kernels win would show up here automatically.

Usage: python benchmarks/pallas_pin.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cuembed_tpu.ops import dispatch
    from cuembed_tpu.types import CombineMode
    from cuembed_tpu.utils.benchmarking import (
        bump_from, carry_probe, robust_chain_time,
    )
    from cuembed_tpu.utils.datagen import PowerLawGenerator

    if args.quick:
        V, B, H, W = 1_000_000, 8192, 16, 256
    else:
        V, B, H, W = 10_000_000, 65_536, 64, 256
    V = V // 8 * 8
    dtype = jnp.bfloat16

    @jax.jit
    def make_table():
        return jnp.concatenate([
            jax.random.uniform(jax.random.key(i), (V // 8, W),
                               jnp.float32, -1, 1).astype(dtype)
            for i in range(8)
        ], axis=0)

    table = jax.block_until_ready(make_table())
    gen = PowerLawGenerator(V - 1, H, 1.15, seed=7, permute=True)
    idx_np = gen.sample(B).astype(np.int32)
    idx = jnp.asarray(idx_np)
    x0 = (jnp.int32(0), jnp.float32(0))
    out = {"config": {"num_categories": V, "batch": B, "hotness": H,
                      "width": W, "dtype": str(jnp.dtype(dtype))},
           "ms": {}}

    def bench(name, step, *ops, iters=3):
        st = robust_chain_time(step, x0, operands=ops, k_lo=1,
                               k_hi=iters, repeats=2, return_stats=True)
        out["ms"][name] = round(st["median"] * 1e3, 3)
        print(f"# {name}: {st['median'] * 1e3:.3f} ms", file=sys.stderr,
              flush=True)

    def fwd_step(backend):
        @jax.jit
        def s(carry, table, idx):
            i, dep = carry
            ii = idx + bump_from(dep)
            o = dispatch.forward(table, ii, None, None,
                                 mode=CombineMode.SUM, backend=backend)
            return (i + 1, carry_probe(o))
        return s

    bench("forward_pallas", fwd_step("pallas"), table, idx)
    bench("forward_xla", fwd_step("xla"), table, idx)

    # backward on the index-sorted COO (same volume)
    nnz = B * H
    flat = idx_np.reshape(-1)
    order = np.argsort(flat, kind="stable")
    t_i = jnp.asarray(flat[order])
    t_s = jnp.asarray((np.arange(nnz, dtype=np.int32) // H)[order])
    gy = jnp.asarray(
        np.random.default_rng(3).integers(-10, 11, (B, W)), jnp.float32
    )

    def bwd_step(backend):
        @jax.jit
        def s(carry, gy, t_i, t_s):
            i, dep = carry
            g = gy + bump_from(dep).astype(gy.dtype)
            o = dispatch.backward(g, V, t_i, t_s, None, backend=backend)
            return (i + 1, carry_probe(o))
        return s

    from cuembed_tpu.ops import pallas_backward

    if pallas_backward.supported(gy, V):
        bench("backward_pallas", bwd_step("pallas"), gy, t_i, t_s)
    else:
        out["ms"]["backward_pallas"] = None
        print("# backward_pallas unsupported at this shape",
              file=sys.stderr)
    bench("backward_xla", bwd_step("auto"), gy, t_i, t_s)

    fp, fx = out["ms"]["forward_pallas"], out["ms"]["forward_xla"]
    out["pallas_fwd_ns_per_row"] = round(fp * 1e6 / nnz, 2)
    out["xla_fwd_ns_per_row"] = round(fx * 1e6 / nnz, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
