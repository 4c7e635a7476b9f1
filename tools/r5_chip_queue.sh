#!/bin/bash
# Round-5 on-chip work queue (VERDICT r4 items 1, 4, 5, 3-bench).
#
# Runs the chip-bound round-5 jobs in priority order, each stage
# timeout-bounded so a wedged tunnel fails loudly and the queue moves
# on. Designed to be launched behind tools/wait_for_tpu.sh:
#
#   nohup tools/wait_for_tpu.sh -- bash tools/r5_chip_queue.sh \
#       > runs/r5_queue.log 2>&1 &
#
# Stage order = value order (if the tunnel dies mid-queue, the most
# important artifacts are already on disk):
#   1. backward-step dispersion fine-tune FROM the 800-epoch depth
#      checkpoint (runs/r4_bstep_deeper) + eval        [VERDICT item 1]
#   2. cylinder fine-tune FROM the 800-epoch depth checkpoint
#      (runs/r4_cyl_deeper) + eval64                   [VERDICT item 1]
#   3. v3 backward-step dispersion fine-tune + eval    [VERDICT item 4]
#   4. C=128 width probe on-chip                       [VERDICT item 5]
#   5. bench.py rehearsal (fresh committed-fallback numbers)  [item 3]
#
# The fine-tune recipe is the exact r4 one that produced
# runs/r4_bstep/eval_ft_redraw (knobs read back from that checkpoint's
# meta): 10 epochs, nets scope, lr 3e-5, lambda_disp 0.5,
# lambda_crps 0.3, lambda_spec 0.02, learned per-scale tau. Evals of
# widened samplers use eval.overflow_redraw=true (OPERATIONS.md guard
# rails). fixture_version is pinned EXPLICITLY per stage so the queue
# is robust to the round-5 v3 default flip.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
SENTINEL=runs/r5_queue.RUNNING
touch "$SENTINEL"
trap 'rm -f "$SENTINEL"' EXIT

FT_KNOBS="finetune.epochs=10 finetune.n_members=6 finetune.lambda_crps=0.3 finetune.lambda_spec=0.02 finetune.lambda_disp=0.5 finetune.train_scope=nets finetune.lr=3e-5"

stage() { echo "=== [$(date -u +%FT%TZ)] $*"; }

stage "1a: backward-step fine-tune from r4_bstep_deeper (800ep, v2)"
timeout 5400 python -m tpuflow.tools.finetune backward-step \
  data.fixture_version=2 \
  finetune.source_dir=runs/r4_bstep_deeper/checkpoints \
  finetune.checkpoint_dir=runs/r5_bstep_ft/checkpoints \
  $FT_KNOBS || echo "STAGE-FAIL 1a rc=$?"

stage "1b: evaluate r5_bstep_ft (overflow redraw)"
timeout 3600 python -m tpuflow.cli.evaluate backward-step \
  data.fixture_version=2 \
  train.checkpoint_dir=runs/r5_bstep_ft/checkpoints \
  eval.overflow_redraw=true \
  eval.output_dir=runs/r5_bstep_ft/eval || echo "STAGE-FAIL 1b rc=$?"

stage "2a: cylinder fine-tune from r4_cyl_deeper (800ep, v2)"
timeout 7200 python -m tpuflow.tools.finetune cylinder-array \
  data.fixture_version=2 \
  finetune.source_dir=runs/r4_cyl_deeper/checkpoints \
  finetune.checkpoint_dir=runs/r5_cyl_ft/checkpoints \
  $FT_KNOBS || echo "STAGE-FAIL 2a rc=$?"

stage "2b: evaluate r5_cyl_ft (overflow redraw, 64-step calibration)"
timeout 3600 python -m tpuflow.cli.evaluate cylinder-array \
  data.fixture_version=2 \
  train.checkpoint_dir=runs/r5_cyl_ft/checkpoints \
  eval.overflow_redraw=true eval.calibration_steps=64 \
  eval.output_dir=runs/r5_cyl_ft/eval64 || echo "STAGE-FAIL 2b rc=$?"

stage "3a: v3 backward-step fine-tune from r4_v3 (400ep, v3)"
timeout 5400 python -m tpuflow.tools.finetune backward-step \
  data.fixture_version=3 \
  finetune.source_dir=runs/r4_v3/checkpoints \
  finetune.checkpoint_dir=runs/r5_v3_ft/checkpoints \
  $FT_KNOBS || echo "STAGE-FAIL 3a rc=$?"

stage "3b: evaluate r5_v3_ft (overflow redraw)"
timeout 3600 python -m tpuflow.cli.evaluate backward-step \
  data.fixture_version=3 \
  train.checkpoint_dir=runs/r5_v3_ft/checkpoints \
  eval.overflow_redraw=true \
  eval.output_dir=runs/r5_v3_ft/eval || echo "STAGE-FAIL 3b rc=$?"

stage "4: C=128 width probe on-chip"
timeout 3600 python -m tpuflow.tools.probe_width backward-step \
  > runs/r5_probe_width.json 2> runs/r5_probe_width.log \
  || echo "STAGE-FAIL 4 rc=$?"
cat runs/r5_probe_width.json

stage "5: bench rehearsal (current repo defaults)"
timeout 2400 python bench.py > runs/r5_bench_rehearsal.json \
  2> runs/r5_bench_rehearsal.log || echo "STAGE-FAIL 5 rc=$?"
tail -2 runs/r5_bench_rehearsal.json

stage "queue done"
