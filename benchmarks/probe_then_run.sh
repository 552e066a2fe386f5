#!/usr/bin/env bash
# Probe the axon TPU tunnel in a loop; whenever it is UP **and healthy**
# (streaming rate above the sweep gate's own threshold), run the on-chip
# runbook (benchmarks/run_onchip_r4.sh). If the runbook dies mid-run
# (tunnel flap / degraded window), go back to probing and rerun — the
# sweep stages use --resume, so completed work is never repeated.
#
#     nohup bash benchmarks/probe_then_run.sh > /tmp/probe_then_run.log 2>&1 &
#
# Env knobs: MAX_ATTEMPTS (default 12), PROBE_SLEEP (240 s),
# CUEMBED_SKIP_LANE=1 skips the runbook's stage-1 test lane (when it
# already passed this session).
set -u
cd "$(dirname "$0")/.."

MAX_ATTEMPTS="${MAX_ATTEMPTS:-12}"
PROBE_SLEEP="${PROBE_SLEEP:-240}"
log() { printf '[%s] %s\n' "$(date +%H:%M:%S)" "$*"; }

probe() {
  # healthy == the same bar sweep_runner's gate applies (0.5 * 0.83 * peak)
  timeout 300 python - <<'EOF' > /tmp/tunnel_probe.out 2>&1
import jax
from cuembed_tpu.utils.benchmarking import detect_hbm_peak_gbps, stream_rate_gbps
d = jax.devices()
rate = stream_rate_gbps(256)
good = 0.5 * 0.83 * detect_hbm_peak_gbps()
print(f"{d} stream={rate:.0f} GB/s (gate {good:.0f})")
raise SystemExit(0 if rate >= good else 3)
EOF
}

attempt=0
while [ "$attempt" -lt "$MAX_ATTEMPTS" ]; do
  log "probing tunnel (liveness + stream rate)..."
  if ! probe; then
    log "tunnel down or degraded: $(tail -1 /tmp/tunnel_probe.out); sleeping ${PROBE_SLEEP}s"
    sleep "$PROBE_SLEEP"
    continue
  fi
  log "tunnel healthy: $(tail -1 /tmp/tunnel_probe.out)"
  attempt=$((attempt + 1))
  log "launching run_onchip_r4.sh (attempt $attempt/$MAX_ATTEMPTS)"
  bash benchmarks/run_onchip_r4.sh 2>&1 | tee -a /tmp/onchip_r4.log
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
