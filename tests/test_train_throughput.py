"""Test-asserted composed training throughput (BASELINE gate #5; the time
counterpart of tests/test_memory_budget.py). Recomputes the projected v5p-8
step times / items-per-second for both reference workloads from the real
param-tree shapes + the measured per-layer anchors, and pins the derived
quantities so a shape or measured-constant change that breaks the statement
fails CI."""

import numpy as np

from tokensgen_tpu.train.throughput import (
    CHIP_BF16_PEAK, MEASURED_TO2V_MS_PER_LAYER_B1, t2to_throughput,
    to2v_throughput)


def test_to2v_v5p8_statement():
    t = to2v_throughput(per_device_batch=2, accum=9, n_devices=8, chip="v5p")
    r = t.rows
    # the projection chain is pure arithmetic — recompute it here
    micro = 42 * (MEASURED_TO2V_MS_PER_LAYER_B1 / 1e3) * 2 \
        * CHIP_BF16_PEAK["v5e"] / CHIP_BF16_PEAK["v5p"]
    assert abs(r["projected v5p micro-step (s)"] - micro) < 1e-6
    assert abs(r["projected v5p optimizer step (s, accum 9)"] - 9 * micro) < 1e-6
    # reference workload: 2 x 8 x 9 = 144 items per optimizer step
    assert 1.0 < r["items/s (global)"] < 1.4, r
    # implied v5e MFU must be physically plausible (not a mis-scaled anchor)
    assert 0.25 < r["implied v5e MFU"] < 0.75, r
    # host pipeline: the required decode cores fit a real TPU-VM host
    assert r["host decode cores needed (15.2 cpu-s/item)"] < 32
    assert (r["host decode cores needed (15.2 cpu-s/item)"]
            < r["host cores available (v5e-8/v5p-8 hosts)"])
    # grad all-reduce is negligible vs the step (overlappable besides)
    assert r["grad all-reduce (s, overlappable)"] < 0.01 * micro * 9


def test_t2to_v5p8_statement():
    t = t2to_throughput(per_device_batch=3, accum=5, n_devices=8, chip="v5p")
    r = t.rows
    step = r["projected v5p optimizer step (s, accum 5)"]
    assert 25 < step < 45, r
    assert 3.0 < r["items/s (global, precomputed-latent inputs)"] < 4.0, r
    assert 0.3 < r["implied v5e MFU"] < 0.8, r
    # 5.57B f32 grads over 8-way ICI ring: sub-second, overlappable
    assert r["grad all-reduce (s, overlappable)"] < 1.0


def test_projection_scales_with_chip_peak():
    """The v5p projection is exactly the v5e time scaled by the peak ratio —
    the stated (conservative, compute-bound) model."""
    v5e = to2v_throughput(chip="v5e")
    v5p = to2v_throughput(chip="v5p")
    ratio = CHIP_BF16_PEAK["v5p"] / CHIP_BF16_PEAK["v5e"]
    np.testing.assert_allclose(
        v5e.rows["projected v5e micro-step (s)"],
        v5p.rows["projected v5p micro-step (s)"] * ratio, rtol=1e-9)


def test_trainable_count_matches_memory_budget():
    """The psum-bytes basis (trainable To2V leaves) agrees with the memory
    budget's f32-masters row (same eval_shape trees)."""
    from tokensgen_tpu.train.memory import to2v_budget
    from tokensgen_tpu.train.throughput import _trainable_param_count_to2v

    n = _trainable_param_count_to2v()
    gib = to2v_budget().rows["trainable masters (f32, replicated)"]
    np.testing.assert_allclose(n * 4 / 1024**3, gib, rtol=1e-6)
