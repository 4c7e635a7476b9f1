#!/bin/bash
# Round-5 on-chip queue, part 3: finish the v3 fine-tune eval, run the
# GENTLER merge retries motivated by the measured part-2 outcomes,
# then the probe/bench and the v3 depth resumes.
#
# Measured context (part 2, runs/r5_*_ft):
# - backward-step merge (3e-5, disp 0.5, spec 0.02, guard->epoch 3):
#   honest dispersion (raw cov 0.395@0.50, spread 1.00, bpd -9.54) but
#   raw TKE collapsed 0.72 -> 0.48. Retry: half the lr, tighter skip
#   budget (0.2), more epochs — widen slowly, stay near the source's
#   second moments.
# - cylinder merge: raw TKE 0.82 -> 1.21 (win) but the huge v2
#   spectral term (~70 in the objective at lambda_spec=0.02) drove
#   tau DOWN and dispersion collapsed (spread 3.66). Retry:
#   lambda_spec=0 (isolate dispersion), gentler lr.
set -u
cd "$(dirname "$0")/.."
SENTINEL=runs/r5_queue.RUNNING
touch "$SENTINEL"
trap 'rm -f "$SENTINEL"' EXIT

stage() { echo "=== [$(date -u +%FT%TZ)] $*"; }

stage "0: wait for the in-flight stage-3a fine-tune to release the chip"
for i in $(seq 1 120); do
  if ! ps -e -o args= | grep -F "tpuflow.tools.finetune" | grep -qv grep; then
    break
  fi
  sleep 30
done
sleep 10

stage "3b: evaluate r5_v3_ft (overflow redraw)"
timeout 3600 python -m tpuflow.cli.evaluate backward-step \
  data.fixture_version=3 \
  train.checkpoint_dir=runs/r5_v3_ft/checkpoints \
  eval.overflow_redraw=true \
  eval.output_dir=runs/r5_v3_ft/eval || echo "STAGE-FAIL 3b rc=$?"

stage "R1a: bstep merge retry — lr 1e-5, skip budget 0.2, 16 epochs"
timeout 5400 python -m tpuflow.tools.finetune backward-step \
  data.fixture_version=2 \
  finetune.source_dir=runs/r4_bstep_deeper/checkpoints \
  finetune.checkpoint_dir=runs/r5_bstep_ft2/checkpoints \
  finetune.epochs=16 finetune.n_members=6 finetune.lambda_crps=0.3 \
  finetune.lambda_spec=0.02 finetune.lambda_disp=0.5 \
  finetune.train_scope=nets finetune.lr=1e-5 \
  finetune.max_skipped_frac=0.2 || echo "STAGE-FAIL R1a rc=$?"

stage "R1b: evaluate r5_bstep_ft2"
timeout 3600 python -m tpuflow.cli.evaluate backward-step \
  data.fixture_version=2 \
  train.checkpoint_dir=runs/r5_bstep_ft2/checkpoints \
  eval.overflow_redraw=true \
  eval.output_dir=runs/r5_bstep_ft2/eval || echo "STAGE-FAIL R1b rc=$?"

stage "R2a: cylinder merge retry — no spectral term, lr 2e-5, skip 0.3"
timeout 5400 python -m tpuflow.tools.finetune cylinder-array \
  data.fixture_version=2 \
  finetune.source_dir=runs/r4_cyl_deeper/checkpoints \
  finetune.checkpoint_dir=runs/r5_cyl_ft2/checkpoints \
  finetune.epochs=12 finetune.n_members=6 finetune.lambda_crps=0.3 \
  finetune.lambda_spec=0.0 finetune.lambda_disp=0.5 \
  finetune.train_scope=nets finetune.lr=2e-5 \
  finetune.max_skipped_frac=0.3 || echo "STAGE-FAIL R2a rc=$?"

stage "R2b: evaluate r5_cyl_ft2 (overflow redraw, 64-step calibration)"
timeout 3600 python -m tpuflow.cli.evaluate cylinder-array \
  data.fixture_version=2 \
  train.checkpoint_dir=runs/r5_cyl_ft2/checkpoints \
  eval.overflow_redraw=true eval.calibration_steps=64 \
  eval.output_dir=runs/r5_cyl_ft2/eval64 || echo "STAGE-FAIL R2b rc=$?"

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

stage "8a: C=128 co-design quality run (v3, 400 epochs, fresh)"
mkdir -p runs/r5_c128
timeout 10800 python -m tpuflow.tools.supervise_train backward-step \
  data.fixture_version=3 model.coupling_width=128 train.epochs=400 \
  train.lr=5e-4 train.grad_clip=100 train.eval_every=40 \
  train.checkpoint_dir=runs/r5_c128/checkpoints \
  > runs/r5_c128/supervisor.log 2>&1 || echo "STAGE-FAIL 8a rc=$?"
tail -3 runs/r5_c128/supervisor.log

stage "8b: evaluate r5_c128"
timeout 3600 python -m tpuflow.cli.evaluate backward-step \
  data.fixture_version=3 model.coupling_width=128 \
  train.checkpoint_dir=runs/r5_c128/checkpoints \
  eval.output_dir=runs/r5_c128/eval || echo "STAGE-FAIL 8b rc=$?"

stage "queue really done"

stage "9a: GUARDED gentle fine-tune from the 800-epoch v3 checkpoint"
timeout 5400 python -m tpuflow.tools.finetune backward-step \
  data.fixture_version=3 \
  finetune.source_dir=runs/r5_v3_deeper/checkpoints \
  finetune.checkpoint_dir=runs/r5_v3_deep_ft/checkpoints \
  finetune.epochs=16 finetune.n_members=6 finetune.lambda_crps=0.3 \
  finetune.lambda_spec=0.02 finetune.lambda_disp=0.5 \
  finetune.train_scope=nets finetune.lr=1e-5 \
  finetune.max_skipped_frac=0.2 || echo "STAGE-FAIL 9a rc=$?"

stage "9b: evaluate r5_v3_deep_ft (overflow redraw)"
timeout 3600 python -m tpuflow.cli.evaluate backward-step \
  data.fixture_version=3 \
  train.checkpoint_dir=runs/r5_v3_deep_ft/checkpoints \
  eval.overflow_redraw=true \
  eval.output_dir=runs/r5_v3_deep_ft/eval || echo "STAGE-FAIL 9b rc=$?"

stage "queue finally done"

stage "10: re-export serving artifacts for the deployed flagships"
timeout 1800 python -m tpuflow.tools.export_rollout backward-step \
  data.fixture_version=2 \
  train.checkpoint_dir=runs/r5_bstep_ft2/checkpoints \
  eval.output_dir=runs/r5_bstep_ft2/eval || echo "STAGE-FAIL 10a rc=$?"
timeout 1800 python -m tpuflow.tools.export_rollout backward-step \
  data.fixture_version=3 \
  train.checkpoint_dir=runs/r5_v3_deeper/checkpoints \
  eval.output_dir=runs/r5_v3_deeper/eval || echo "STAGE-FAIL 10b rc=$?"

stage "11: clean solo bench (fallback refresh source)"
timeout 2400 python bench.py > runs/r5_bench_final.json \
  2> runs/r5_bench_final.log || echo "STAGE-FAIL 11 rc=$?"
tail -1 runs/r5_bench_final.json

stage "queue complete"
