#!/bin/bash
# Evaluation-only preset; pass --load-weights/--resume for your checkpoint.
python train_vidreid_xent_htri.py -d prid2011 \
    -a vmgn --evaluate --seq-len 8 --test-sample evenly \
    --num-split 4 --pyramid-part --num-gb 2 --use-pose --learn-graph \
    --dist-metric cosine \
    --load-weights saved-models/prid2011/model_prid2011.msgpack \
    --save-dir log/prid2011 "$@"
