#!/bin/bash
# Induce the q49/q09 disturbance class against a RUNNING bench JVM:
# a SIGSTOP/SIGCONT duty cycle. The victim burns no foreign CPU
# (host ≈ self stays true — the round-16 dirty-run arm is blind to it)
# but wall time inflates for everything, including the ~80 ms inter-run
# spin probes, so the round-17 probe arm must flag the hit runs.
#
# Usage: induce_stopstorm.sh <pid> <seconds> [stop_ms] [run_ms]
# Default duty cycle: 80 ms stopped / 20 ms running = ~5x wall dilation.
set -e
PID="$1"; DUR="${2:-20}"; STOP_MS="${3:-80}"; RUN_MS="${4:-20}"
END=$(( $(date +%s) + DUR ))
echo "[stopstorm] pid=$PID for ${DUR}s (${STOP_MS}ms stop / ${RUN_MS}ms run)"
# ms → fractional seconds via awk: the old "0.$(printf %03d ms)" form
# silently slept 10x short for ms >= 1000 (1500 → "0.1500" = 0.15 s)
STOP_S="$(awk "BEGIN{printf \"%.3f\", $STOP_MS/1000}")"
RUN_S="$(awk "BEGIN{printf \"%.3f\", $RUN_MS/1000}")"
while [ "$(date +%s)" -lt "$END" ] && kill -0 "$PID" 2>/dev/null; do
  kill -STOP "$PID" 2>/dev/null || break
  sleep "$STOP_S"
  kill -CONT "$PID" 2>/dev/null || break
  sleep "$RUN_S"
done
kill -CONT "$PID" 2>/dev/null || true
echo "[stopstorm] done"
