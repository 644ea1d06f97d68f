#!/bin/bash
# Round-5 w8a8 drift campaign (VERDICT r4 "Next round" item 1):
#   1. T2To token-stage drift arms (the quantized SECOND stage, never measured)
#   2. downstream feed: both token tracks rendered by ONE fixed bf16 To2V FIFO
#   3. production-geometry To2V FIFO arms: 52 steps, num_partitions=4
#      (8 lookahead ranks), stochastic DPM with identical injected noise
#      (`cogvideo_sampling_mp_fifo.py:223-334` geometry)
#   4. long-horizon arm: reduced depth (8 layers), 9 chunks -> 156 FIFO
#      iterations, same production geometry
# Each FIFO arm checkpoints its emitted series per iteration, so partial
# results survive crashes. Run: bash tools/run_drift_r5.sh >/tmp/drift5.log 2>&1
set -x
cd "$(dirname "$0")/.."
P=python

# 1. T2To token-stage drift (42 layers, production 52 steps, 2 chunks)
$P tools/drift_w8a8.py run-t2to bf16 52 2 42
$P tools/drift_w8a8.py run-t2to w8a8 52 2 42
$P tools/drift_w8a8.py compare-t2to 52 2 42

# 2. downstream feed (fixed bf16 To2V, 8 layers, production FIFO geometry)
$P tools/drift_w8a8.py run-feed bf16 52 2 42 8
$P tools/drift_w8a8.py run-feed w8a8 52 2 42 8
$P tools/drift_w8a8.py compare-feed 52 2 42 8 --decode

# 3. production-geometry To2V FIFO arms (42 layers)
$P tools/drift_w8a8.py run w8a8 52 2 42 8 4 1
$P tools/drift_w8a8.py run bf16 52 2 42 8 4 1
$P tools/drift_w8a8.py compare 52 2 42 4 1 --decode

# 4. long-horizon arm (8 layers, 9 chunks -> 156 iterations)
$P tools/drift_w8a8.py run w8a8 52 9 8 8 4 1
$P tools/drift_w8a8.py run bf16 52 9 8 8 4 1
$P tools/drift_w8a8.py compare 52 9 8 4 1

echo "DRIFT_R5_DONE"
