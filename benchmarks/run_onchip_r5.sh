#!/usr/bin/env bash
# Round-5 on-chip measurement runbook.
#
#     bash benchmarks/run_onchip_r5.sh [fast]
#
# Round-4 lesson (VERDICT r4 ask 2): every stage tees to a COMMITTED
# path under benchmarks/results_r5/ — a measurement that only exists in
# /tmp doesn't exist. Stages are restart-friendly: the sweeps use
# --resume, everything else is cheap to re-run. "fast" skips the sweep
# stages (2-3).
set -uo pipefail
cd "$(dirname "$0")/.."

FAST="${1:-}"
export CUEMBED_SKIP_PROBE=1  # stage 1 already proves the tunnel
R5=benchmarks/results_r5
mkdir -p "$R5"
log() { printf '\n=== [%s] %s ===\n' "$(date +%H:%M:%S)" "$*"; }

if [ "${CUEMBED_SKIP_LANE:-}" = "1" ]; then
  log "stage 1: SKIPPED (CUEMBED_SKIP_LANE=1 — lane already green this session)"
else
  log "stage 1: on-chip test lane (pytest -m tpu)"
  JAX_PLATFORMS=tpu python -m pytest tests/ -m tpu -q || exit 1
fi

if [ "$FAST" != "fast" ]; then
  log "stage 2: fixed reference grid (resume fills re-measured configs)"
  python benchmarks/sweep_runner.py --out benchmarks/results_v5e_r4.csv \
    --iters 20 --resume || exit 1

  log "stage 3: CSR slice, round-5 engine (live slice + scatter-free combine)"
  python benchmarks/sweep_runner.py --csr \
    --out benchmarks/results_v5e_r5_csr.csv --iters 20 --resume || exit 1
fi

log "stage 3b: plausibility gate on every committed sweep CSV"
python benchmarks/check_sweep.py benchmarks/results_v5e_r4.csv \
  benchmarks/results_v5e_r4_csr.csv benchmarks/results_v5e_r5_csr.csv \
  || exit 1

log "stage 4: headline bench (exact best + labeled lossy int8 row)"
python bench.py | tee "$R5/bench_best.json" || exit 1

log "stage 4b: CSR flagship point"
python bench.py --csr | tee "$R5/bench_csr.json" || exit 1

log "stage 4c: pin the opt-in Pallas kernels (fwd + bwd vs XLA)"
python benchmarks/pallas_pin.py | tee "$R5/pallas_pin.json" || exit 1

log "stage 4d: chip constants record (VMEM boundary, pack rate, tiering law)"
python benchmarks/calibrate_chip.py || exit 1

log "stage 5: train-step profile (SGD/AdaGrad device vs wall)"
python benchmarks/profile_train.py | tee "$R5/train_profile.txt" || exit 1

log "stage 6: train benchmark, chained (production dispatch regime)"
python benchmarks/train_benchmark.py --chained | tee "$R5/train_chained.txt" || exit 1

log "stage 6b: fused multi-table group vs per-table dispatches"
python benchmarks/fused_benchmark.py | tee "$R5/fused.txt" || exit 1

log "stage 6c: offloaded-table step vs resident (host prepare pipelined)"
python benchmarks/offload_benchmark.py | tee "$R5/offload.txt" || exit 1

log "stage 6d: planner validation (plan() vs measured placements)"
JAX_PLATFORMS=tpu python benchmarks/planner_validation.py \
  --csv "$R5/planner_validation.csv" || exit 1

log "stage 7: CSR gap closure record (profile + sort A/B)"
python benchmarks/profile_csr.py | tee "$R5/profile_csr.json" || exit 1
python benchmarks/sort_ab.py | tee "$R5/sort_ab.json" || exit 1

log "stage 7b: flagship backward op-level profile (sort-attack evidence)"
python benchmarks/profile_backward.py | tee "$R5/profile_backward.txt" || exit 1

if [ -f benchmarks/results_v5e_r4.csv ]; then
  log "stage 8: regenerate the summary doc from the committed CSVs"
  python benchmarks/gen_sweep_summary.py benchmarks/results_v5e_r4.csv \
    benchmarks/results_v5e_r5_csr.csv > docs/SWEEP_SUMMARY.md || exit 1
fi

log "runbook complete — commit benchmarks/results_r5/, the CSVs, the chip record, and docs/SWEEP_SUMMARY.md"
