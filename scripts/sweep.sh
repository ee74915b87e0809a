#!/usr/bin/env bash
# Hyperparameter sweep over IIC x UDA weights at a fixed seed — the
# reference's run_bash grid (/root/reference/semi_seg/run_bash:1-40).
set -euo pipefail

seed=${RANDOM_SEED:-10}
max_epoch=${MAX_EPOCH:-100}
num_batches=${NUM_BATCHES:-300}
save_root=${SAVE_ROOT:-sweep}

run() {
  python -m mi_based_regularized_semi_supervised_segmentation_tpu.main \
    RandomSeed="${seed}" Trainer.max_epoch="${max_epoch}" Trainer.num_batches="${num_batches}" "$@"
}

# baselines
run Trainer.name=partial Trainer.save_dir="${save_root}/ps" Data.labeled_data_ratio=0.05 Data.unlabeled_data_ratio=0.95
run Trainer.name=partial Trainer.save_dir="${save_root}/fs" Data.labeled_data_ratio=1.0 Data.unlabeled_data_ratio=0.0

# grid over regularizer weights
for iic_w in 0.01 0.05 0.1 0.5; do
  for uda_w in 1.0 5.0 10.0; do
    run Trainer.name=udaiic Trainer.save_dir="${save_root}/udaiic_iic${iic_w}_uda${uda_w}" \
      IICRegParameters.weight="${iic_w}" UDARegCriterion.weight="${uda_w}"
  done
done
