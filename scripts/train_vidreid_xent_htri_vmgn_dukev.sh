#!/bin/bash
source "$(dirname "$0")/_vmgn_common.sh"
python train_vidreid_xent_htri.py -d dukemtmcvidreid "${VMGN_ARGS[@]}" \
    --max-epoch 200 --stepsize 50 100 150 --eval-step 5 \
    --save-dir log/video/vmgn/dukev-ngb2-consistent "$@"
