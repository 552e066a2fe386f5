#!/usr/bin/env python
"""Headline benchmark: forward lookup application bandwidth on one chip.

Flagship configuration from the reference (``README.md:104``): 10M
categories x width 256, batch 65536, hotness 64, alpha=1.15 power-law
indices with the reference's default category permutation
(``embedding_allocation.h:94``), half-precision table (bf16 — the TPU's
native half type; same bytes as the reference's fp16). Metric =
application GB/s (the reference's forward bandwidth formula,
``manual_benchmark.cu:250-261``) over the best backend.

Backends compared each run:
  * ``auto``  — the tiered hot/cold engine (frequency-remapped ids, VMEM
    hot head, compacted cold gather; see cuembed_tpu/ops/tiered.py),
  * ``xla``   — the plain gather+reduce baseline.

``vs_baseline`` is achieved / (0.80 * HBM speed-of-light) — the BASELINE.md
north-star target (>= 80% of per-chip HBM peak), since the reference
publishes no measured numbers.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _devices_reachable(timeout_s: float) -> bool:
    """Probe device discovery in a subprocess.

    The axon TPU tunnel, when down, hangs ``jax.devices()`` indefinitely
    rather than erroring — a bench invocation must fail fast with an
    honest JSON line instead of wedging the driver. Skipped when the
    process is already configured for CPU (tests) — see main().
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _probe_or_bail() -> bool:
    """True if it is safe to proceed to device work."""
    if os.environ.get("CUEMBED_SKIP_PROBE") == "1":
        return True  # caller (e.g. the runbook) already proved the tunnel
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return True
    if "jax" in sys.modules:
        import jax

        if (jax.config.jax_platforms or "") == "cpu":
            return True  # test harness already pinned CPU in-process
    timeout_s = float(os.environ.get("CUEMBED_PROBE_TIMEOUT", "180"))
    return _devices_reachable(timeout_s)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small config (smoke)")
    p.add_argument("--backend", default="best",
                   choices=["best", "auto", "tiered", "tiered-int8",
                            "int8-full", "pallas", "xla"])
    p.add_argument("--num-categories", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--hotness", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--alpha", type=float, default=None)
    p.add_argument("--dtype", default=None,
                   choices=[None, "float32", "float16", "bfloat16"])
    p.add_argument("--no-permute", action="store_true",
                   help="datagen without category permutation")
    p.add_argument("--csr", action="store_true",
                   help="flagship CSR point: per-sample hotness "
                        "~ U{0..hotness} (reference "
                        "embedding_allocation.cu:130-135), CSR 3-tier "
                        "combine vs plain XLA, parity-checked on the "
                        "first call")
    args = p.parse_args()

    if not _probe_or_bail():
        print(json.dumps({
            "metric": (
                "forward_lookup_csr_app_bw" if args.csr
                else "forward_lookup_app_bw"
            ),
            "value": 0.0,
            "unit": "GB/s",
            "vs_baseline": 0.0,
            "error": "TPU device discovery timed out (axon tunnel "
                     "down); no measurement taken",
        }))
        return 1

    import jax
    import jax.numpy as jnp

    from cuembed_tpu.ops.api import embedding_lookup
    from cuembed_tpu.types import CombineMode
    from cuembed_tpu.utils.benchmarking import (
        bump_from,
        robust_chain_time,
        detect_hbm_peak_gbps,
        forward_app_bytes,
        carry_probe,
        lookups_per_sec,
    )
    from cuembed_tpu.utils.datagen import PowerLawGenerator


    if args.quick:
        V, B, H, W, alpha, dtype = 1_000_000, 8192, 32, 256, 1.15, jnp.float32
    else:
        V, B, H, W, alpha, dtype = 10_000_000, 65_536, 64, 256, 1.15, jnp.bfloat16
    V = args.num_categories or V
    B = args.batch or B
    H = args.hotness or H
    W = args.width or W
    alpha = args.alpha if args.alpha is not None else alpha
    if args.dtype:
        dtype = jnp.dtype(args.dtype)
    permute = not args.no_permute

    # Table materialized on device directly in the storage dtype (host
    # upload of GBs through a tunnel is not part of the measurement, and
    # an fp32 staging copy of a 10M x 256 table would not fit HBM).
    @jax.jit
    def make_table():
        parts = [
            jax.random.uniform(
                jax.random.key(i), (V // 8, W), jnp.float32, -1, 1
            ).astype(dtype)
            for i in range(8)
        ]
        return jnp.concatenate(parts, axis=0)

    Vpad = (V // 8) * 8
    table = jax.block_until_ready(make_table())
    V = Vpad

    # One measured batch; every chained step carries a data dependency on
    # the previous output, so no (executable, input) pair ever repeats —
    # a dynamic_index_in_dim over multiple staged sets was measured to
    # add ~25 ms of pathological slice overhead inside the tiered graph.
    gen = PowerLawGenerator(V - 1, H, alpha, seed=7, permute=permute)
    idx_np = gen.sample(B).astype(np.int32)
    idx_sets = jnp.asarray(idx_np)

    if args.csr:
        # ---- flagship CSR point (VERDICT r2 ask 7) ---------------------
        from cuembed_tpu.ops.api import embedding_lookup_csr
        from cuembed_tpu.ops.tiered import auto_config
        from cuembed_tpu.utils.calibration import refine_tiered_config
        from cuembed_tpu.utils.frequency import (
            count_frequencies, frequency_order,
        )

        elem = jnp.dtype(dtype).itemsize
        rng = np.random.default_rng(11)
        per = rng.integers(0, H + 1, size=B)
        offs_np = np.zeros(B + 1, np.int64)
        offs_np[1:] = np.cumsum(per)
        cap = B * H
        nnz_live = int(offs_np[-1])
        mask = np.arange(H)[None, :] < per[:, None]
        vals_np = np.zeros(cap, np.int32)
        vals_np[:nnz_live] = idx_np[mask]
        # Calibration draws must live in the SAME permuted id space as
        # the measured batch: a PowerLawGenerator's permutation derives
        # from its seed, so 8 permute=True generators with different
        # seeds produce 8 unrelated id spaces — their aggregated counts
        # are near-uniform, the frequency remap is garbage, and the
        # engine classes everything cold (the CSR flagship measured
        # 36.5 ms this way vs 16.9 with a real remap).
        counts = None
        for i in range(8):
            g = PowerLawGenerator(V - 1, H, alpha, seed=900 + i,
                                  permute=False)
            draw = g.sample(B)
            if permute and gen.permutation is not None:
                draw = gen.permutation[draw]
            counts = count_frequencies(draw, V, counts)
        _, remap = frequency_order(counts)
        avg_hot = max(1, nnz_live // B)
        cfg0 = auto_config(V, W, elem, avg_hot)
        tiered = None
        if cfg0 is not None:
            vals_np[:nnz_live] = remap[vals_np[:nnz_live]]
            tiered = refine_tiered_config(
                cfg0, vals_np[:nnz_live], capacity_margin=1.1,
                calib_offsets=offs_np, value_capacity=cap,
            )
        vals = jnp.asarray(vals_np)
        offs = jnp.asarray(offs_np.astype(np.int32))

        def make_csr_step(backend, cfg_b):
            # Chain dependency = sum-of-squares of the full output
            # (benchmarking.carry_probe): a bare scalar probe lets XLA
            # DCE the gather. Operands (not closures): a captured table
            # bakes into the fori executable as a constant.
            @jax.jit
            def step(carry, table, vals, offs):
                i, dep = carry
                vv = vals + bump_from(dep)
                out = embedding_lookup_csr(
                    table, vv, offs, mode=CombineMode.SUM,
                    backend=backend, tiered_cfg=cfg_b,
                )
                return (i + 1, carry_probe(out))
            return step

        # parity: tiered vs plain XLA on the measured batch
        if tiered is not None:
            a = embedding_lookup_csr(table, vals, offs,
                                     mode=CombineMode.SUM,
                                     backend="tiered", tiered_cfg=tiered)
            b = embedding_lookup_csr(table, vals, offs,
                                     mode=CombineMode.SUM, backend="xla")
            err = float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b.astype(jnp.float32)
            )))
            print(f"# csr parity max|tiered-xla| = {err:.4f}",
                  file=sys.stderr)
            assert err < (0.25 if dtype == jnp.bfloat16 else 1e-3), err

        results = {}
        for backend, cfg_b in (
            [("tiered", tiered)] if tiered is not None else []
        ) + [("xla", None)]:
            csr_step = make_csr_step(backend, cfg_b)
            st = robust_chain_time(
                csr_step, (jnp.int32(0), jnp.float32(0)),
                operands=(table, vals, offs),
                k_lo=1, k_hi=4, repeats=3, return_stats=True,
            )
            results[backend] = st["min"]
        best_backend = min(results, key=results.get)
        dt = results[best_backend]
        app = forward_app_bytes(
            batch=B, hotness=nnz_live / B, width=W, elem_bytes=elem,
            mode=CombineMode.SUM,
        )
        gbps = app / dt / 1e9
        peak = detect_hbm_peak_gbps()
        print(json.dumps({
            "metric": "forward_lookup_csr_app_bw",
            "value": round(gbps, 2),
            "unit": "GB/s",
            "vs_baseline": round(gbps / (0.80 * peak), 4),
            "config": {
                "num_categories": V, "batch": B, "max_hotness": H,
                "avg_hotness": round(nnz_live / B, 2), "width": W,
                "alpha": alpha, "dtype": str(jnp.dtype(dtype)),
                "backend": best_backend,
            },
            "time_ms": round(dt * 1e3, 3),
            "all_backends_ms": {
                k: round(v * 1e3, 3) for k, v in results.items()
            },
            "hbm_peak_gbps": peak,
        }))
        return

    # --- tiered engine setup (frequency ordering + capacity calibration) --
    # Frequency statistics come from separate calibration draws of the same
    # distribution, the way a production job uses running stats — not from
    # the measured batches. The id->row remap itself is applied in the
    # input pipeline on the host (the standard place for id mapping),
    # overlapped with device compute in steady state; the device-side
    # remap variant costs one extra 4-byte gather per lookup.
    from cuembed_tpu.utils.calibration import calibrate_powerlaw_workload

    elem = jnp.dtype(dtype).itemsize
    cfg, idx_rm, remap = calibrate_powerlaw_workload(
        V, B, H, alpha, W, elem, permute=permute, seed=7,
        capacity_margin=1.05,
    )
    idx_tiered = None
    if cfg is not None:
        idx_np = idx_rm  # measured batch, host-remapped (pipeline step)
        idx_tiered = jnp.asarray(idx_rm)
        # capacity diagnostics (drives the lax.cond fallback if violated)
        E = cfg.chunk_elems
        flat = idx_rm.reshape(1, -1)
        pad = (-flat.shape[1]) % E
        flat = np.pad(flat, ((0, 0), (0, pad)))
        ch = flat.reshape(1, -1, E)
        mid_max = int((((ch >= cfg.mxu_head_rows) & (ch < cfg.hot_rows)).sum(-1)).max())
        cold_max = int(((ch >= cfg.hot_rows).sum(-1)).max())
        print(f"# tiered diag: mid max/slots {mid_max}/{cfg.mid_slots} "
              f"cold max/slots {cold_max}/{cfg.cold_slots} "
              f"hot_rows {cfg.hot_rows}", file=sys.stderr)

    app_bytes = forward_app_bytes(
        batch=B, hotness=H, width=W, elem_bytes=elem, mode=CombineMode.SUM
    )

    # --- int8 serving modes: quantize ONCE at setup (a serving cache,
    # like the frequency reorder). Lossy — documented bound in
    # ops/quant.py — so they NEVER compete for the exact headline: under
    # --backend best they are measured separately and reported as a
    # clearly-labeled secondary "lossy" row beside the exact number.
    q_head, q_cfg = None, None
    if args.backend in ("tiered-int8", "best") and cfg is not None:
        from dataclasses import replace

        from cuembed_tpu.ops.quant import int8_head_rows, quantize_head
        from cuembed_tpu.utils.frequency import calibrate_capacities

        q_rows = min(V // 8 * 8, int8_head_rows(W, cfg.hot_rows * W * elem))
        mid_s, cold_s = calibrate_capacities(
            idx_rm, None, cfg.mxu_head_rows, q_rows, cfg.chunk_elems,
            margin=1.1,
        )
        q_cfg = replace(cfg, hot_rows=q_rows, mid_slots=mid_s,
                        cold_slots=cold_s)
        q_head = jax.block_until_ready(quantize_head(table[:q_rows]))
        print(f"# int8 head: {q_rows} rows (vs {cfg.hot_rows} exact), "
              f"mid/cold slots {mid_s}/{cold_s}", file=sys.stderr)
    elif args.backend == "tiered-int8":
        raise SystemExit("tiered-int8 needs a >VMEM table (no head)")

    # --- whole-table int8 (int8-full): quantized AFTER the exact
    # measurements (below) — a second 3.6 GB table resident during the
    # exact chains would perturb or OOM them at flagship scale.
    q_full = None
    want_full = args.backend in ("int8-full", "best")

    def make_step(backend):
        use_tiered = (
            backend in ("auto", "tiered", "tiered-int8")
            and idx_tiered is not None
        )
        tiered = cfg if use_tiered else None
        sets = idx_tiered if use_tiered else idx_sets

        # table/idx_sets enter as jit arguments, NOT closure captures — a
        # captured GB-scale array would be baked into the HLO as a constant.
        if backend == "int8-full":
            from cuembed_tpu.ops.quant import int8_serving_lookup

            @jax.jit
            def step_full(carry, q_data, idx_sets):
                from cuembed_tpu.ops.quant import QuantizedHead

                i, dep = carry
                idx = idx_sets + bump_from(dep)
                out = int8_serving_lookup(
                    QuantizedHead(q_data), idx, mode=CombineMode.SUM
                )
                return (i + 1, carry_probe(out))

            return step_full, (q_full.data, sets)

        if backend == "tiered-int8":
            from cuembed_tpu.ops.tiered import tiered_forward

            @jax.jit
            def step_int8(carry, table, q_head, idx_sets):
                i, dep = carry
                idx = idx_sets + bump_from(dep)
                out = tiered_forward(
                    table, idx, mode=CombineMode.SUM, cfg=q_cfg,
                    q_head=q_head,
                )
                return (i + 1, carry_probe(out))

            return step_int8, (table, q_head, sets)

        @jax.jit
        def step_impl(carry, table, idx_sets):
            i, dep = carry
            idx = idx_sets + bump_from(dep)
            out = embedding_lookup(
                table, idx, mode=CombineMode.SUM, backend=backend,
                tiered_cfg=tiered,
            )
            return (i + 1, carry_probe(out))

        return step_impl, (table, sets)

    backends = (
        ["auto", "xla"] if args.backend == "best" else [args.backend]
    )
    lossy_backends = []
    if args.backend == "best":
        if q_head is not None:
            lossy_backends.append("tiered-int8")
        if want_full:
            lossy_backends.append("int8-full")
    results, medians = {}, {}
    bstep = ops = None
    # int8-full is measured LAST with the exact table released: the mode
    # exists to serve without the exact bytes resident, and holding both
    # (4.8 + 3.6 GB at flagship) next to the chain's gather intermediates
    # exhausts HBM.
    for backend in [b for b in backends if b != "int8-full"] + [
            b for b in lossy_backends if b != "int8-full"]:
        try:
            bstep, ops = make_step(backend)
            st = robust_chain_time(bstep, (jnp.int32(0), jnp.float32(0)),
                                   operands=ops,
                                   k_lo=1, k_hi=4, repeats=3,
                                   return_stats=True)
            results[backend] = st["min"]
            medians[backend] = st["median"]
        except Exception as e:  # pragma: no cover
            print(f"# backend {backend} failed: {str(e).splitlines()[0]}",
                  file=sys.stderr)
    # Measured error vs the exact path on a 4K-sample probe slice — the
    # error is per-element bounded (ops/quant.py) so a slice suffices,
    # and a full-batch exact gather (2.1 GB intermediate) OOMs next to
    # the resident int8 copy of the whole table. Probed BEFORE the
    # int8-full measurement because that releases the exact table.
    if want_full:
        from cuembed_tpu.ops.quant import quantize_head

        q_full = jax.block_until_ready(quantize_head(table))
        print(f"# int8 full table: {q_full.data.nbytes / 2**30:.2f} GiB "
              f"(vs {table.nbytes / 2**30:.2f})", file=sys.stderr)

    lossy_errs = {}
    if lossy_backends:
        from cuembed_tpu.ops.quant import QuantizedHead, int8_serving_lookup
        from cuembed_tpu.ops.tiered import tiered_forward

        probe = min(B, 4096)
        for lb in lossy_backends:
            if lb == "tiered-int8":
                probe_idx = idx_tiered[:probe]
                lossy_out = tiered_forward(
                    table, probe_idx, mode=CombineMode.SUM, cfg=q_cfg,
                    q_head=q_head,
                ).astype(jnp.float32)
            else:
                probe_idx = idx_sets[:probe]
                lossy_out = int8_serving_lookup(
                    QuantizedHead(q_full.data), probe_idx,
                    mode=CombineMode.SUM,
                ).astype(jnp.float32)
            exact_ref = embedding_lookup(
                table, probe_idx, mode=CombineMode.SUM, backend="xla",
            ).astype(jnp.float32)
            lossy_errs[lb] = float(
                jnp.max(jnp.abs(lossy_out - exact_ref))
            )

    if "int8-full" in lossy_backends or args.backend == "int8-full":
        bstep_full, ops_full = make_step("int8-full")
        # release the exact table (the serving mode's whole point): the
        # loop's last (bstep, ops) pair and make_step's closure all hold
        # references to it.
        bstep = ops = None
        del make_step
        table = None
        try:
            st = robust_chain_time(
                bstep_full, (jnp.int32(0), jnp.float32(0)),
                operands=ops_full, k_lo=1, k_hi=4, repeats=3,
                return_stats=True,
            )
            results["int8-full"] = st["min"]
            medians["int8-full"] = st["median"]
        except Exception as e:  # pragma: no cover
            print(f"# backend int8-full failed: "
                  f"{str(e).splitlines()[0]}", file=sys.stderr)

    if not results:
        raise SystemExit("no backend produced a result")

    # Lossy int8 serving modes never take the exact headline: split them
    # out and report them as a labeled secondary row (VERDICT r4 ask 6).
    lossy_results = {
        k: results.pop(k) for k in list(results)
        if k in ("tiered-int8", "int8-full")
        and args.backend == "best"
    }
    lossy_record = None
    if lossy_results:
        lb = min(lossy_results, key=lossy_results.get)
        ldt = lossy_results[lb]
        err = lossy_errs.get(lb, float("nan"))
        lossy_record = {
            "backend": lb,
            "value": round(app_bytes / ldt / 1e9, 2),
            "unit": "GB/s",
            "time_ms": round(ldt * 1e3, 3),
            "all_lossy_ms": {
                k: round(v * 1e3, 3) for k, v in lossy_results.items()
            },
            "max_abs_err_measured": round(err, 4),
            "err_bound": "<= max|row|/254 per element on int8-served "
                         "rows (ops/quant.py; exact rows unaffected)",
        }

    best_backend = min(results, key=results.get)
    dt = results[best_backend]
    gbps = app_bytes / dt / 1e9
    peak = detect_hbm_peak_gbps()
    target = 0.80 * peak
    record = {
        "metric": "forward_lookup_app_bw",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / target, 4),
        "config": {
            "num_categories": V,
            "batch": B,
            "hotness": H,
            "width": W,
            "alpha": alpha,
            "dtype": str(jnp.dtype(dtype)),
            "permuted_ids": permute,
            "backend": best_backend,
            "tiered": None if cfg is None else {
                "hot_rows": cfg.hot_rows,
                "chunk_elems": cfg.chunk_elems,
                "cold_slots": cfg.cold_slots,
            },
        },
        "time_ms": round(dt * 1e3, 3),
        "time_ms_median": round(medians[best_backend] * 1e3, 3),
        "all_backends_ms": {k: round(v * 1e3, 3) for k, v in results.items()},
        "lookups_per_sec": round(lookups_per_sec(B, H, dt)),
        "hbm_peak_gbps": peak,
    }
    if lossy_record is not None:
        record["lossy_int8"] = lossy_record
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
