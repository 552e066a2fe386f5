#!/usr/bin/env bash
# Probe the axon TPU tunnel in a loop; whenever jax.devices() answers,
# run the round-3 on-chip runbook (benchmarks/run_onchip_r3.sh). If the
# runbook dies mid-run (tunnel flap), go back to probing and rerun — the
# sweep stages use --resume, so completed work is never repeated.
#
#     nohup bash benchmarks/probe_then_run.sh > /tmp/probe_then_run.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

MAX_ATTEMPTS="${MAX_ATTEMPTS:-12}"
log() { printf '[%s] %s\n' "$(date +%H:%M:%S)" "$*"; }

attempt=0
while [ "$attempt" -lt "$MAX_ATTEMPTS" ]; do
  log "probing tunnel..."
  if ! timeout 170 python -c "import jax; d=jax.devices(); print(d)" \
      > /tmp/tunnel_probe.out 2>&1; then
    log "tunnel still down; sleeping 240s"
    sleep 240
    continue
  fi
  log "tunnel is UP: $(cat /tmp/tunnel_probe.out)"
  attempt=$((attempt + 1))
  log "launching run_onchip_r3.sh (attempt $attempt/$MAX_ATTEMPTS)"
  bash benchmarks/run_onchip_r3.sh 2>&1 | tee -a /tmp/onchip_r3.log
  rc=${PIPESTATUS[0]}
  if [ "$rc" -eq 0 ]; then
    log "runbook finished clean (exit 0)"
    exit 0
  fi
  log "runbook died (exit $rc) — back to probing; --resume will skip done work"
  sleep 60
done
log "gave up after $MAX_ATTEMPTS runbook attempts"
exit 1
