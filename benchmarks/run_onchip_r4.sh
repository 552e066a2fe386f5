#!/usr/bin/env bash
# Round-4 on-chip measurement runbook. Run on a healthy-DEVICE window
# (the stream gate now measures the chip through an on-device fori
# chain, so tunnel RTT noise no longer blocks it):
#
#     bash benchmarks/run_onchip_r4.sh [fast]
#
# Sequences every measurement round 4 needs from the chip. Each stage is
# restart-friendly (the sweep uses --resume); rerun after a tunnel flap
# and completed work is skipped. "fast" skips the full sweep
# regeneration (stages 2-3) for a quick spot check.
#
# Results go to *_r4 files: the min(rpc, fori) timing policy and the
# full-output-carry DCE fix (docs/PERF_NOTES.md §timing) changed the
# measurement itself, so r3-policy rows must not be mixed in.
set -uo pipefail
cd "$(dirname "$0")/.."

FAST="${1:-}"
export CUEMBED_SKIP_PROBE=1  # stage 1 already proves the tunnel
log() { printf '\n=== [%s] %s ===\n' "$(date +%H:%M:%S)" "$*"; }

if [ "${CUEMBED_SKIP_LANE:-}" = "1" ]; then
  log "stage 1: SKIPPED (CUEMBED_SKIP_LANE=1 — lane already green this session)"
else
  log "stage 1: on-chip test lane (pytest -m tpu)"
  JAX_PLATFORMS=tpu python -m pytest tests/ -m tpu -q || exit 1
fi

if [ "$FAST" != "fast" ]; then
  log "stage 2: full reference grid resweep (20 iters, fori stream gate)"
  python benchmarks/sweep_runner.py --out benchmarks/results_v5e_r4.csv \
    --iters 20 --resume || exit 1

  log "stage 3: CSR slice"
  python benchmarks/sweep_runner.py --csr \
    --out benchmarks/results_v5e_r4_csr.csv --iters 20 --resume || exit 1
fi

log "stage 4: headline bench (best backend)"
python bench.py | tee /tmp/bench_r4_best.json || exit 1

log "stage 4b: headline bench (tiered-int8 serving mode)"
python bench.py --backend tiered-int8 | tee /tmp/bench_r4_int8.json || exit 1

log "stage 4b2: headline bench (whole-table int8 serving mode)"
python bench.py --backend int8-full | tee /tmp/bench_r4_int8full.json || exit 1

log "stage 4c: CSR flagship point"
python bench.py --csr | tee /tmp/bench_r4_csr.json || exit 1

log "stage 4d: flagship knob retune (mxu_head_rows x exact/int8 head)"
JAX_PLATFORMS=tpu python benchmarks/retune_headline.py \
  --csv benchmarks/retune_r4.csv || exit 1

log "stage 5: train-step profile (SGD/AdaGrad device vs wall)"
python benchmarks/profile_train.py || exit 1

log "stage 6: train benchmark, chained (production dispatch regime)"
python benchmarks/train_benchmark.py --chained || exit 1

log "stage 6b: fused multi-table group vs per-table dispatches"
python benchmarks/fused_benchmark.py || exit 1

log "stage 6c: offloaded-table step vs resident (host prepare pipelined)"
python benchmarks/offload_benchmark.py || exit 1

log "stage 6d: offload break-even curve (batch x tail size)"
python benchmarks/offload_benchmark.py --sweep \
  --csv benchmarks/offload_breakeven_r4.csv || exit 1

log "stage 6e: planner validation (plan() vs measured placements)"
JAX_PLATFORMS=tpu python benchmarks/planner_validation.py \
  --csv benchmarks/planner_validation_r4.csv || exit 1

if [ "$FAST" != "fast" ] && [ -f benchmarks/results_v5e_r4.csv ]; then
  log "stage 7: regenerate the summary table from the fresh CSV"
  {
    python benchmarks/gen_sweep_summary.py benchmarks/results_v5e_r4.csv
    echo
    python benchmarks/gen_sweep_summary.py benchmarks/results_v5e_r4_csr.csv \
      2>/dev/null || true
  } > /tmp/sweep_summary_r4.md
  echo "table at /tmp/sweep_summary_r4.md — splice into docs/SWEEP_SUMMARY.md"
fi

log "done — commit results_v5e_r4*.csv + update SWEEP_SUMMARY/PERF_NOTES"
