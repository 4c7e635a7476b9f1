#!/bin/bash
# Wait for the accelerator to become reachable, then run a command.
#
# A remote TPU tunnel can wedge for HOURS (client init hangs rather
# than errors — see docs/OPERATIONS.md troubleshooting). This watcher
# probes with a bounded client attempt every INTERVAL seconds and
# launches the given command on first success, so recovery does not
# depend on a human re-probing by hand:
#
#   nohup tools/wait_for_tpu.sh -- tpuflow-supervise backward-step \
#       train.epochs=5000 > watch.log 2>&1 &
#
# Env knobs: PROBE_TIMEOUT (default 110s), INTERVAL (default 900s),
# MAX_PROBES (default 60).
set -u
PROBE_TIMEOUT=${PROBE_TIMEOUT:-110}
INTERVAL=${INTERVAL:-900}
MAX_PROBES=${MAX_PROBES:-60}

if [ "${1:-}" = "--" ]; then shift; fi
if [ $# -eq 0 ]; then
  echo "usage: wait_for_tpu.sh [--] <command...>" >&2
  exit 2
fi

for i in $(seq 1 "$MAX_PROBES"); do
  if timeout "$PROBE_TIMEOUT" python -c "import jax; print(jax.devices())" \
      > /dev/null 2>&1; then
    echo "[wait_for_tpu] accelerator reachable at $(date); launching: $*" >&2
    sleep 5  # let the probe client's teardown finish before attaching
    exec "$@"
  fi
  echo "[wait_for_tpu] probe $i/$MAX_PROBES failed at $(date); retrying in ${INTERVAL}s" >&2
  sleep "$INTERVAL"
done
echo "[wait_for_tpu] gave up after $MAX_PROBES probes" >&2
exit 1
