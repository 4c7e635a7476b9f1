#!/bin/bash
# Round-5 on-chip queue, part 4 (final): the remaining part-3 stages in
# PRIORITY order for the last ~2h of the round.
#
#   P1  9a/9b  guarded gentle fine-tune from the 800-epoch v3 checkpoint
#              (the one remaining "merge depth + dispersion" combination)
#   P2  10     serving-artifact exports for the deployed flagships
#   P3  8a/8b  C=128 co-design quality run (bounded; supervise_train
#              checkpoints every 40 epochs, so a timeout still leaves an
#              evaluable checkpoint)
#   P4  11     clean solo bench (fallback refresh source)
#
# Everything is timeout-bounded so the chip is free before round end.
set -u
cd "$(dirname "$0")/.."
SENTINEL=runs/r5_queue.RUNNING
touch "$SENTINEL"
trap 'rm -f "$SENTINEL"' EXIT

stage() { echo "=== [$(date -u +%FT%TZ)] $*"; }

stage "9a: GUARDED gentle fine-tune from the 800-epoch v3 checkpoint"
timeout 3300 python -m tpuflow.tools.finetune backward-step \
  data.fixture_version=3 \
  finetune.source_dir=runs/r5_v3_deeper/checkpoints \
  finetune.checkpoint_dir=runs/r5_v3_deep_ft/checkpoints \
  finetune.epochs=16 finetune.n_members=6 finetune.lambda_crps=0.3 \
  finetune.lambda_spec=0.02 finetune.lambda_disp=0.5 \
  finetune.train_scope=nets finetune.lr=1e-5 \
  finetune.max_skipped_frac=0.2 || echo "STAGE-FAIL 9a rc=$?"

stage "9b: evaluate r5_v3_deep_ft (overflow redraw)"
timeout 2400 python -m tpuflow.cli.evaluate backward-step \
  data.fixture_version=3 \
  train.checkpoint_dir=runs/r5_v3_deep_ft/checkpoints \
  eval.overflow_redraw=true \
  eval.output_dir=runs/r5_v3_deep_ft/eval || echo "STAGE-FAIL 9b rc=$?"

stage "10: serving artifacts for the deployed flagships"
timeout 1200 python -m tpuflow.tools.export_rollout backward-step \
  data.fixture_version=2 \
  train.checkpoint_dir=runs/r5_bstep_ft2/checkpoints \
  eval.output_dir=runs/r5_bstep_ft2/eval || echo "STAGE-FAIL 10a rc=$?"
timeout 1200 python -m tpuflow.tools.export_rollout backward-step \
  data.fixture_version=3 \
  train.checkpoint_dir=runs/r5_v3_deeper/checkpoints \
  eval.output_dir=runs/r5_v3_deeper/eval || echo "STAGE-FAIL 10b rc=$?"

stage "8a: C=128 co-design quality run (v3, bounded — ckpt every 40 ep)"
mkdir -p runs/r5_c128
timeout 3000 python -m tpuflow.tools.supervise_train backward-step \
  data.fixture_version=3 model.coupling_width=128 train.epochs=400 \
  train.lr=5e-4 train.grad_clip=100 train.eval_every=40 \
  train.checkpoint_dir=runs/r5_c128/checkpoints \
  > runs/r5_c128/supervisor.log 2>&1 || echo "STAGE-FAIL 8a rc=$?"
tail -3 runs/r5_c128/supervisor.log

stage "8b: evaluate r5_c128 (latest checkpoint, even if 8a timed out)"
timeout 2400 python -m tpuflow.cli.evaluate backward-step \
  data.fixture_version=3 model.coupling_width=128 \
  train.checkpoint_dir=runs/r5_c128/checkpoints \
  eval.output_dir=runs/r5_c128/eval || echo "STAGE-FAIL 8b rc=$?"

stage "11: clean solo bench (fallback refresh source)"
timeout 1800 python bench.py > runs/r5_bench_final.json \
  2> runs/r5_bench_final.log || echo "STAGE-FAIL 11 rc=$?"
tail -1 runs/r5_bench_final.json

stage "queue part 4 complete"
