#!/bin/bash
# Round-3 perf endgame queue: runs after the 42-layer e2e frees the chip.
# Each step appends to /tmp/perf_queue_r3.log; one TPU job at a time.
set -x
cd /root/repo
{
  echo "=== [1/4] dit parts breakdown B=2 (floor-table data) ==="
  timeout 2400 python tools/bench_dit_parts.py 2
  echo "=== [2/4] bench.py BENCH_FUSE_QKV=1 ==="
  BENCH_FUSE_QKV=1 timeout 2400 python bench.py
  echo "=== [3/4] bench.py BENCH_QUANT=w8a8 (labeled turbo) ==="
  BENCH_QUANT=w8a8 timeout 2400 python bench.py
  echo "=== [4/5] bench.py BENCH_QUANT=w8a8 BENCH_FUSE_QKV=1 ==="
  BENCH_QUANT=w8a8 BENCH_FUSE_QKV=1 timeout 2400 python bench.py
  echo "=== [5/5] T2To full-finetune train step (6 layers) ==="
  timeout 2400 python tools/bench_train_t2to.py 6 3
  echo "=== queue done ==="
} >> /tmp/perf_queue_r3.log 2>&1
