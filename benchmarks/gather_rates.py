#!/usr/bin/env python
"""Gather/combine rate exploration on the attached chip.

Answers the questions that set the tiered engine's ceiling:
  1. row-gather rate vs source-operand size (VMEM placement boundary)
  2. rate vs dtype (f32 / bf16) and index count
  3. whether two data-independent gathers in one jit overlap at all
  4. one-hot combine cost with non-constant operands, f32 vs bf16
  5. head-matrix matmul cost: f32-HIGHEST vs bf16 operands
Feeds docs/PERF_NOTES.md — rerun when porting to a new chip.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cuembed_tpu.utils.benchmarking import chain_time

W = 256


def bench(name, fn, x0=jnp.int32(0)):
    dt = chain_time(fn, x0, k_lo=1, k_hi=4, repeats=3)
    print(f"{name:56s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)

    # -- 1+2: gather rate vs operand size / dtype ---------------------
    NIDX = 1 << 21  # 2M indices
    for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        itemsize = jnp.dtype(dtype).itemsize
        for mb in (4, 16, 48, 96, 112):
            rows = mb * 1024 * 1024 // (W * itemsize)
            src = jnp.asarray(
                rng.standard_normal((rows, W)).astype(np.float32)
            ).astype(dtype)
            idx = jnp.asarray(
                rng.integers(0, rows, size=(NIDX,), dtype=np.int32))

            @jax.jit
            def g(src, idx, carry):
                i = idx + (carry & 1)
                r = jnp.take(src, i, axis=0)
                return r[0, 0].astype(jnp.int32)

            dt = bench(f"gather {NIDX>>20}M rows x {name} from {mb:4d} MB "
                       f"({rows} rows)", lambda c, s=src, i=idx: g(s, i, c))
            print(f"    -> {NIDX/dt/1e6:8.1f} M rows/s", flush=True)
            del src

    # -- sortedness effect (96MB bf16) --------------------------------
    rows = 96 * 1024 * 1024 // (W * 2)
    src = jnp.asarray(
        rng.standard_normal((rows, W)).astype(np.float32)).astype(jnp.bfloat16)
    idx_np = rng.integers(0, rows, size=(NIDX,), dtype=np.int32)
    for label, iarr in (
        ("random", idx_np),
        ("globally sorted", np.sort(idx_np)),
        ("chunk-sorted(2048)", np.sort(idx_np.reshape(-1, 2048), axis=1).reshape(-1)),
    ):
        idx = jnp.asarray(iarr)

        @jax.jit
        def g2(src, idx, carry):
            i = idx + (carry & 1)
            r = jnp.take(src, i, axis=0)
            return r[0, 0].astype(jnp.int32)

        dt = bench(f"gather 2M bf16 96MB, {label}",
                   lambda c, s=src, i=idx: g2(s, i, c))
        print(f"    -> {NIDX/dt/1e6:8.1f} M rows/s", flush=True)

    # -- 3: do two independent gathers overlap? -----------------------
    rows_h = 96 * 1024 * 1024 // (W * 2)
    big_rows = 4_000_000
    big = jnp.asarray(
        rng.standard_normal((big_rows, W)).astype(np.float32)
    ).astype(jnp.bfloat16)
    n_mid, n_cold = 1 << 21, 1 << 19
    i_mid = jnp.asarray(rng.integers(0, rows_h, (n_mid,), dtype=np.int32))
    i_cold = jnp.asarray(rng.integers(0, big_rows, (n_cold,), dtype=np.int32))

    @jax.jit
    def g_mid(src, idx, carry):
        r = jnp.take(src, idx + (carry & 1), axis=0)
        return r[0, 0].astype(jnp.int32)

    @jax.jit
    def g_cold(src, idx, carry):
        r = jnp.take(src, idx + (carry & 1), axis=0)
        return r[0, 0].astype(jnp.int32)

    @jax.jit
    def g_both(srcm, srcc, im, ic, carry):
        a = jnp.take(srcm, im + (carry & 1), axis=0)
        b = jnp.take(srcc, ic + (carry & 1), axis=0)
        return (a[0, 0] + b[0, 0]).astype(jnp.int32)

    t_m = bench("mid-only gather 2M from 96MB",
                lambda c: g_mid(src, i_mid, c))
    t_c = bench("cold-only gather 512K from 2GB",
                lambda c: g_cold(big, i_cold, c))
    t_b = bench("both in one jit (overlap test)",
                lambda c: g_both(src, big, i_mid, i_cold, c))
    print(f"    -> sum {1e3*(t_m+t_c):.3f} ms vs fused {1e3*t_b:.3f} ms",
          flush=True)

    # -- 4: one-hot combine with live operands ------------------------
    G, S, GS = 2048, 1200, 32
    rows_live = jnp.asarray(
        rng.standard_normal((G, S, W)).astype(np.float32)).astype(jnp.bfloat16)
    s_slots = jnp.asarray(rng.integers(0, GS, (G, S), dtype=np.int32))

    for oh_dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):

        @jax.jit
        def comb(rows, slots, carry):
            s = slots + (carry & 1) * 0
            onehot = (
                (s[..., None] == jnp.arange(GS, dtype=jnp.int32))
                .astype(oh_dt)
            )
            part = jax.lax.dot_general(
                onehot, rows + carry.astype(rows.dtype) * 0,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return part[0, 0, 0].astype(jnp.int32)

        bench(f"one-hot combine [G,{S},{GS}]x[G,{S},{W}] oh={name}",
              lambda c, f=comb: f(rows_live, s_slots, c))

    # -- 5: head matmul f32-HIGHEST vs bf16 ---------------------------
    B, HEAD = 65536, 128
    m_f = jnp.asarray(rng.integers(0, 3, (B, HEAD)).astype(np.float32))
    head_bf = jnp.asarray(
        rng.standard_normal((HEAD, W)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def mm_f32(m, h, carry):
        out = jnp.dot(m + carry.astype(jnp.float32) * 0, h.astype(jnp.float32),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        return out[0, 0].astype(jnp.int32)

    @jax.jit
    def mm_bf16(m, h, carry):
        out = jnp.dot((m + carry.astype(jnp.float32) * 0).astype(jnp.bfloat16),
                      h,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        return out[0, 0].astype(jnp.int32)

    @jax.jit
    def mm_mixed(m, h, carry):
        out = jax.lax.dot_general(
            m + carry.astype(jnp.float32) * 0, h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return out[0, 0].astype(jnp.int32)

    bench("head mm [64K,128]@[128,256] f32xf32 HIGHEST",
          lambda c: mm_f32(m_f, head_bf, c))
    bench("head mm bf16xbf16 HIGHEST",
          lambda c: mm_bf16(m_f, head_bf, c))
    try:
        bench("head mm mixed f32xbf16 HIGHEST",
              lambda c: mm_mixed(m_f, head_bf, c))
    except Exception as e:
        print(f"mixed dot failed: {str(e).splitlines()[0]}")


if __name__ == "__main__":
    main()
