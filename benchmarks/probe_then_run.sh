#!/usr/bin/env bash
# Probe the axon TPU tunnel in a loop; the moment jax.devices() answers,
# run the round-3 on-chip runbook (benchmarks/run_onchip_r3.sh).
# Restart-friendly: the runbook's sweep stages use --resume, so rerunning
# this script after a flap skips completed work.
#
#     nohup bash benchmarks/probe_then_run.sh > /tmp/probe_then_run.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

log() { printf '[%s] %s\n' "$(date +%H:%M:%S)" "$*"; }

while true; do
  log "probing tunnel..."
  if timeout 170 python -c "import jax; d=jax.devices(); print(d)" \
      > /tmp/tunnel_probe.out 2>&1; then
    log "tunnel is UP: $(cat /tmp/tunnel_probe.out)"
    break
  fi
  log "tunnel still down; sleeping 240s"
  sleep 240
done

log "launching run_onchip_r3.sh"
bash benchmarks/run_onchip_r3.sh 2>&1 | tee /tmp/onchip_r3.log
rc=${PIPESTATUS[0]}
log "runbook finished (exit $rc)"
exit "$rc"
