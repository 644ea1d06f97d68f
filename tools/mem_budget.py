"""Print the multi-chip training memory budget tables (PERF.md source).

Usage: JAX_PLATFORMS=cpu python tools/mem_budget.py [--throughput]

``--throughput`` also prints the composed v5p-8 training throughput
statement (train/throughput.py, BASELINE gate #5).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tokensgen_tpu.utils.platform import apply_platform_env

apply_platform_env()

from tokensgen_tpu.train.memory import t2to_budget, to2v_budget  # noqa: E402

if __name__ == "__main__":
    print(to2v_budget().table())
    print()
    print(t2to_budget().table())
    print()
    print(to2v_budget(per_device_batch=1, zero_ranks=8).table())
    if "--throughput" in sys.argv:
        from tokensgen_tpu.train.throughput import (
            t2to_throughput, to2v_throughput)

        print()
        print(to2v_throughput().table())
        print()
        print(t2to_throughput().table())
