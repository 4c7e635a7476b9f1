#!/bin/bash
# Round-5 on-chip queue, attempt 2 — with the fine-tune overflow guard
# (tools/finetune.py early-stop + last-healthy-snapshot rollback) that
# attempt 1 measured the need for: the ungated 10-epoch recipe from
# the 800-epoch checkpoint ran 6 healthy epochs (bpd -9.61 -> -9.64,
# dispersion improving) then collapsed to bpd -2.4 with 61/64 windows
# skipped (runs/r5_bstep_ft/finetune_log_attempt1_diverged.csv).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
SENTINEL=runs/r5_queue.RUNNING
touch "$SENTINEL"
trap 'rm -f "$SENTINEL"' EXIT

FT_KNOBS="finetune.epochs=10 finetune.n_members=6 finetune.lambda_crps=0.3 finetune.lambda_spec=0.02 finetune.lambda_disp=0.5 finetune.train_scope=nets finetune.lr=3e-5"

stage() { echo "=== [$(date -u +%FT%TZ)] $*"; }

stage "1a: GUARDED backward-step fine-tune from r4_bstep_deeper (800ep, v2)"
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

stage "2a: GUARDED cylinder fine-tune from r4_cyl_deeper (800ep, v2)"
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

stage "3a: GUARDED v3 backward-step fine-tune from r4_v3 (400ep, v3)"
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

stage "5: bench rehearsal (v3 presets)"
timeout 2400 python bench.py > runs/r5_bench_rehearsal.json \
  2> runs/r5_bench_rehearsal.log || echo "STAGE-FAIL 5 rc=$?"
tail -2 runs/r5_bench_rehearsal.json

stage "6a: v3 backward-step depth resume 400->800"
if [ ! -d runs/r5_v3_deeper/checkpoints ]; then
  mkdir -p runs/r5_v3_deeper
  cp -r runs/r4_v3/checkpoints runs/r5_v3_deeper/checkpoints
fi
timeout 7200 python -m tpuflow.tools.supervise_train backward-step \
  data.fixture_version=3 train.epochs=800 train.lr=5e-4 \
  train.grad_clip=100 train.eval_every=40 \
  train.checkpoint_dir=runs/r5_v3_deeper/checkpoints \
  > runs/r5_v3_deeper/supervisor.log 2>&1 || echo "STAGE-FAIL 6a rc=$?"
tail -3 runs/r5_v3_deeper/supervisor.log

stage "6b: evaluate r5_v3_deeper"
timeout 3600 python -m tpuflow.cli.evaluate backward-step \
  data.fixture_version=3 \
  train.checkpoint_dir=runs/r5_v3_deeper/checkpoints \
  eval.output_dir=runs/r5_v3_deeper/eval || echo "STAGE-FAIL 6b rc=$?"

stage "7a: v3 cylinder depth resume 400->800"
if [ ! -d runs/r5_v3cyl_deeper/checkpoints ]; then
  mkdir -p runs/r5_v3cyl_deeper
  cp -r runs/r4_v3cyl/checkpoints runs/r5_v3cyl_deeper/checkpoints
fi
timeout 9000 python -m tpuflow.tools.supervise_train cylinder-array \
  data.fixture_version=3 train.epochs=800 train.lr=5e-4 \
  train.grad_clip=100 train.eval_every=40 \
  train.checkpoint_dir=runs/r5_v3cyl_deeper/checkpoints \
  > runs/r5_v3cyl_deeper/supervisor.log 2>&1 || echo "STAGE-FAIL 7a rc=$?"
tail -3 runs/r5_v3cyl_deeper/supervisor.log

stage "7b: evaluate r5_v3cyl_deeper (64-step calibration)"
timeout 3600 python -m tpuflow.cli.evaluate cylinder-array \
  data.fixture_version=3 \
  train.checkpoint_dir=runs/r5_v3cyl_deeper/checkpoints \
  eval.calibration_steps=64 \
  eval.output_dir=runs/r5_v3cyl_deeper/eval64 || echo "STAGE-FAIL 7b rc=$?"

stage "queue done"
