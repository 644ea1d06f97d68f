#!/bin/bash
# Round-5 w8a8 drift campaign (VERDICT r4 item 1): close the serving-default
# evidence gap at the SHIPPED production geometry. Three arm groups, all on
# one real chip, each arm its own process (HBM + allocator hygiene — see
# tools/drift_w8a8.py header):
#
#   A. FIFO edit path at production geometry: 52 DPM steps, num_partitions=4
#      (8 lookahead ranks), stochastic DPM with arm-identical injected noise,
#      full 42-layer depth, 2x49-frame chunks.
#      Mirrors `cogvideo_sampling_mp_fifo.py:223-334` + `infer_edit.yaml`.
#   B. Long-video horizon at reduced depth: 6 layers, 10 chunks -> 169 FIFO
#      iterations at the same 52-step/4-partition/stochastic geometry.
#   C. T2To token stage (the OTHER quantized stage, never measured in r4):
#      52-step stochastic token DiT bf16-vs-w8a8, then each arm's token
#      track rendered through ONE fixed bf16 To2V FIFO ("feed" arms) and
#      compared as decoded video.
#
# Run:  bash tools/drift_campaign_r5.sh 2>&1 | tee /tmp/drift5.log
set -e
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/tokensgen_tpu_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== [A] FIFO production geometry: 52 steps, parts=4, stoch, 42L, 2 chunks ==="
python tools/drift_w8a8.py run bf16 52 2 42 8 4 1
python tools/drift_w8a8.py run w8a8 52 2 42 8 4 1
python tools/drift_w8a8.py compare 52 2 42 4 1 --decode

echo "=== [B] horizon arm: 52 steps, parts=4, stoch, 6L, 10 chunks (169 iters) ==="
python tools/drift_w8a8.py run bf16 52 10 6 8 4 1
python tools/drift_w8a8.py run w8a8 52 10 6 8 4 1
python tools/drift_w8a8.py compare 52 10 6 4 1

echo "=== [C1] T2To token stage: 52 steps, stoch, 42L, 2 chunks ==="
python tools/drift_w8a8.py run-t2to bf16 52 2 42
python tools/drift_w8a8.py run-t2to w8a8 52 2 42
python tools/drift_w8a8.py compare-t2to 52 2 42

echo "=== [C2] feed arms: each T2To track through one fixed bf16 To2V FIFO (8L) ==="
python tools/drift_w8a8.py run-feed bf16 52 2 42 8
python tools/drift_w8a8.py run-feed w8a8 52 2 42 8
python tools/drift_w8a8.py compare-feed 52 2 42 8 --decode

echo "=== campaign complete ==="
ls -la /tmp/drift4/*.json
