#!/bin/bash
# Resume of drift_campaign_r5.sh after the offload-epilogue OOM (fixed in
# to2v.py commit 428cd79): arm A's bf16 pass completed all 65 FIFO iterations
# and checkpointed 60 of them to
# /tmp/drift4/bf16_s52_c2_l42_p4_st_em_partial.npy before the epilogue
# crashed -- don't re-run it (2.8 h); compare() consumes partial series.
# No set -e: a failed arm must not kill the remaining arm groups.
#
# Run:  bash tools/drift_resume_r5.sh 2>&1 | tee /tmp/drift5b.log
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/tokensgen_tpu_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== [A] w8a8 arm at production geometry (bf16 partial already on disk) ==="
python tools/drift_w8a8.py run w8a8 52 2 42 8 4 1
python tools/drift_w8a8.py compare 52 2 42 4 1 --decode || true

echo "=== [C1] T2To token stage: 52 steps, stoch, 42L, 2 chunks ==="
python tools/drift_w8a8.py run-t2to bf16 52 2 42
python tools/drift_w8a8.py run-t2to w8a8 52 2 42
python tools/drift_w8a8.py compare-t2to 52 2 42 || true

echo "=== [C2] feed arms: each T2To track through one fixed bf16 To2V FIFO (8L) ==="
python tools/drift_w8a8.py run-feed bf16 52 2 42 8
python tools/drift_w8a8.py run-feed w8a8 52 2 42 8
python tools/drift_w8a8.py compare-feed 52 2 42 8 --decode || true

echo "=== [B] horizon arm: 52 steps, parts=4, stoch, 6L, 10 chunks (169 iters) ==="
python tools/drift_w8a8.py run bf16 52 10 6 8 4 1
python tools/drift_w8a8.py run w8a8 52 10 6 8 4 1
python tools/drift_w8a8.py compare 52 10 6 4 1 || true

echo "=== resume campaign complete ==="
ls -la /tmp/drift4/*.json
