#!/bin/bash
# End-of-round finalization: lock in evaluation numbers from the current
# deepest checkpoints, refresh the serving artifact, then run the
# north-star benchmark. Run ONLY with no trainer holding the chip (the
# tunneled client wedges under concurrent clients — docs/OPERATIONS.md).
#
#   tools/finalize_round.sh [outdir]          # default: finalize_out/
#
# Every stage is timeout-bounded so a wedged tunnel fails loudly instead
# of hanging the round. Stages after the first failure still run: a
# broken export must not cost the evaluation numbers, and vice versa.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-finalize_out}
mkdir -p "$OUT"
status=0

echo "[finalize] start $(date -u)"
for case in backward-step cylinder-array; do
  echo "[finalize] evaluate $case"
  timeout 2400 python -m tpuflow.cli.evaluate "$case" || status=1
  timeout 1200 python -m tpuflow.tools.report "$case" || status=1
done

for case in backward-step cylinder-array; do
  echo "[finalize] re-export serving artifact ($case)"
  timeout 1800 python -m tpuflow.tools.export_rollout "$case" || status=1
done

echo "[finalize] north-star bench"
timeout 1800 python bench.py >"$OUT/bench.json" 2>"$OUT/bench.log" || status=1
cat "$OUT/bench.json"

echo "[finalize] done $(date -u) (status $status)"
exit "$status"
