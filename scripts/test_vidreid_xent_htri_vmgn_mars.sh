#!/bin/bash
# Evaluation-only preset; pass --load-weights/--resume for your checkpoint.
python train_vidreid_xent_htri.py -d mars \
    -a vmgn --evaluate --seq-len 8 --test-sample evenly \
    --num-split 4 --pyramid-part --num-gb 2 --use-pose --learn-graph \
    --dist-metric cosine \
    --load-weights saved-models/mars/model_mars.msgpack \
    --save-dir log/mars "$@"
