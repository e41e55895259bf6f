#!/bin/bash
# Idle-gated clean capture (r17 verdict #1). Every capture this repo
# ever published self-flagged window_dirty because the harness never
# WAITED for a quiet window — it stamped and ran. This wrapper makes
# the harness earn the flag:
#
#   1. GATE  — block launch until the 1-minute loadavg reads below
#      $GATE on two consecutive polls 15 s apart (loadavg decays with
#      ~1-min half-life; two polls rejects a decaying spike), and a
#      fixed-work calib probe (graft.tools.CalibProbe) is STABLE
#      across two runs (drift < $CALIB_DRIFT) — loadavg can't see
#      hypervisor throttling, the mode that dirtied r17's runD.
#   2. RUN   — exec the timing main via run_timed.sh (direct java -cp,
#      pre-JVM loadavg stamped into GRAFT_PREJVM_LOADAVG).
#   3. CHECK — parse the artifact's own machine-stamped window_dirty
#      field; on true, idle out and retry, up to $ATTEMPTS windows.
#
# Every attempt (gated loadavg/calib readings, verdict) is appended to
# $LOGFILE so a box that cannot yield a clean window leaves N logged
# attempts as the documented environment floor.
#
# Usage: tools/capture_clean.sh <summaryJson|-> <mainClass> [args...]
#   summaryJson: file the main writes containing a "window_dirty"
#                field (target/bench_summary.json for graft.Bench);
#                "-" skips the post-check (gate-only mode for mains
#                that stamp loadavg but no dirty flag).
# Env: GATE (default 1.0), CALIB_DRIFT (default 0.10),
#      ATTEMPTS (default 4), MAX_IDLE_SECS per attempt (default 1200),
#      LOGFILE (default target/capture_attempts.log),
#      plus run_timed.sh's env (XMX, XMS, SPARK_GRAFT_*).
set -uo pipefail
cd "$(dirname "$0")/.."
SUMMARY="$1"; shift
GATE="${GATE:-1.0}"
CALIB_DRIFT="${CALIB_DRIFT:-0.10}"
ATTEMPTS="${ATTEMPTS:-4}"
MAX_IDLE_SECS="${MAX_IDLE_SECS:-1200}"
LOGFILE="${LOGFILE:-target/capture_attempts.log}"
mkdir -p "$(dirname "$LOGFILE")"

log() { echo "$(date -u +%FT%TZ) $*" | tee -a "$LOGFILE"; }

load1() { cut -d' ' -f1 /proc/loadavg; }

below_gate() { awk -v l="$1" -v g="$GATE" 'BEGIN{exit !(l < g)}'; }

calib_once() {
  # tiny heap, NO pre-touch: the probe must not inherit the capture's
  # XMS=16g+AlwaysPreTouch — zeroing 16 GB per probe is itself a
  # multi-thread burst that spikes the loadavg the gate is watching
  XMS= XMX=256m tools/run_timed.sh graft.tools.CalibProbe 2>/dev/null |
    tail -1
}

calib_stable() {
  local a b s1 s2 m1 m2
  a="$(calib_once)"; sleep 5; b="$(calib_once)"
  read -r s1 m1 < <(python3 -c "
import json,sys
d=json.loads('''$a'''); print(d['calib_single'], d['calib_multi16'])" \
    2>/dev/null) || { log "calib parse failed: $a"; return 1; }
  read -r s2 m2 < <(python3 -c "
import json,sys
d=json.loads('''$b'''); print(d['calib_single'], d['calib_multi16'])" \
    2>/dev/null) || { log "calib parse failed: $b"; return 1; }
  log "calib probe: single $s1/$s2 multi16 $m1/$m2"
  python3 -c "
import sys
def drift(a,b):
    a,b=float(a),float(b)
    return abs(a-b)/min(a,b) if min(a,b)>0 else 0.0
sys.exit(0 if drift('$s1','$s2') < $CALIB_DRIFT and
             drift('$m1','$m2') < $CALIB_DRIFT else 1)"
}

# Order matters: the calib probes are themselves multi-thread bursts
# that raise the 1-min loadavg the launch stamp reads (first wiring
# launched at loadavg 2.51 — instantly dirty — because the probes ran
# AFTER the loadavg gate). Probe calib FIRST, then require the loadavg
# to settle below the gate on two polls, then launch with nothing in
# between.
wait_idle() {
  local waited=0 l
  while [ "$waited" -lt "$MAX_IDLE_SECS" ]; do
    l="$(load1)"
    if below_gate "$l"; then
      if calib_stable; then
        # let the probes' own burst decay back under the gate
        while [ "$waited" -lt "$MAX_IDLE_SECS" ]; do
          sleep 20; waited=$((waited + 20))
          l="$(load1)"
          if below_gate "$l"; then
            sleep 10; waited=$((waited + 10))
            l="$(load1)"
            if below_gate "$l"; then
              log "gate passed: calib stable, loadavg $l < $GATE"
              return 0
            fi
          fi
        done
        log "probe burst never decayed (loadavg $(load1)); re-gating"
      else
        log "calib unstable, re-idling"
        sleep 30; waited=$((waited + 30))
      fi
    else
      sleep 15; waited=$((waited + 15))
    fi
  done
  log "idle gate TIMED OUT after ${MAX_IDLE_SECS}s (loadavg $(load1))"
  return 1
}

for attempt in $(seq 1 "$ATTEMPTS"); do
  log "attempt $attempt/$ATTEMPTS: gating (loadavg $(load1), gate $GATE)"
  wait_idle || continue
  log "attempt $attempt: launching $* (loadavg $(load1))"
  tools/run_timed.sh "$@"
  rc=$?
  if [ "$rc" -ne 0 ]; then
    log "attempt $attempt: main exited rc=$rc"
    continue
  fi
  if [ "$SUMMARY" = "-" ]; then
    log "attempt $attempt: done (gate-only mode, no dirty check)"
    exit 0
  fi
  dirty="$(python3 -c "
import json
print(json.load(open('$SUMMARY'))['window_dirty'])" 2>/dev/null)"
  log "attempt $attempt: window_dirty=$dirty ($SUMMARY)"
  if [ "$dirty" = "False" ] || [ "$dirty" = "false" ]; then
    log "attempt $attempt: CLEAN capture"
    exit 0
  fi
done
log "NO clean window in $ATTEMPTS attempts — see $LOGFILE"
exit 1
