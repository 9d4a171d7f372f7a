#!/bin/bash
# 10-fold cross-validation: one full run per split
source "$(dirname "$0")/_vmgn_common.sh"
for i in $(seq 0 9); do
  python train_vidreid_xent_htri.py -d prid2011 "${VMGN_ARGS[@]}" \
      --max-epoch 400 --stepsize 100 200 300 --eval-step 1 \
      --split-id $i \
      --save-dir log/video/vmgn/prid2011-ngb2-consistent/split$i "$@"
done
