#!/bin/bash
# Shared VMGN preset (paper config): seq-len 8, PK batches 16=4x4,
# restricted training sampling, adam + soft-margin triplet, 4-way pyramid
# parts, 2 graph blocks, pose + learned graph, flip aug, cosine eval,
# consistent loss. Per-dataset epoch/step schedules are passed by callers.
VMGN_ARGS=(
  -a vmgn
  --seq-len 8
  --train-batch 16
  --test-batch 16
  --num-instances 4
  --train-sample restricted
  --train-sampler RandomIdentitySamplerV1
  --test-sample evenly
  --optim adam
  --soft-margin
  --lr 1e-4
  --num-split 4
  --pyramid-part
  --num-gb 2
  --use-pose
  --learn-graph
  --flip-aug
  --print-last
  --dist-metric cosine
  --consistent-loss
)
