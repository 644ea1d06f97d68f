#!/bin/bash
# Round-5 drift campaign, part 2 (t2to arms already landed in /tmp/drift4):
# feed arms (fixed: DiT landed on-device once), production-geometry FIFO
# arms, long-horizon arm.
set -x
cd "$(dirname "$0")/.."
P=python

$P tools/drift_w8a8.py run-feed bf16 52 2 42 8
$P tools/drift_w8a8.py run-feed w8a8 52 2 42 8
$P tools/drift_w8a8.py compare-feed 52 2 42 8 --decode

$P tools/drift_w8a8.py run w8a8 52 2 42 8 4 1
$P tools/drift_w8a8.py run bf16 52 2 42 8 4 1
$P tools/drift_w8a8.py compare 52 2 42 4 1 --decode

$P tools/drift_w8a8.py run w8a8 52 9 8 8 4 1
$P tools/drift_w8a8.py run bf16 52 9 8 8 4 1
$P tools/drift_w8a8.py compare 52 9 8 4 1

echo "DRIFT_R5B_DONE"
