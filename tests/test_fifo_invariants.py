"""FIFO merge-region invariants across the adaptive-padding warm-up ramp.

The reference's merge correctness is by-construction (SURVEY §5.2: the driver
blocks on the queue before mutating shared state). Our psum-scatter merge is
only correct if rank write regions are pairwise disjoint at every
queue_start_idx — checked here exhaustively for both the test geometry and the
production 52/13/4 geometry."""

import numpy as np
import pytest

from tokensgen_tpu.sampling.fifo import FIFOConfig


def _regions(fcfg: FIFOConfig, qs: int):
    nf, r_nf, l_nf = fcfg.nf_per_chunk, fcfg.r_nf, fcfg.l_nf
    regions = []
    for r in range(fcfg.num_ranks):
        s0 = nf * (r // 2) + r_nf * (r % 2)
        mid = s0 + (l_nf if r % 2 == 1 else r_nf)
        real_end = s0 + nf
        active = mid > qs
        if not active:
            continue
        clamped = s0 <= qs
        lo = max(r_nf, qs) if clamped else mid
        hi = real_end if clamped else s0 + nf
        if lo < hi:
            regions.append((r, lo, hi))
    return regions


@pytest.mark.parametrize("geometry", [
    dict(nf_per_chunk=4, num_partitions=2, num_inference_steps=8, num_frames=8),
    dict(nf_per_chunk=13, num_partitions=4, num_inference_steps=52, num_frames=52),
])
def test_merge_regions_disjoint_and_cover(geometry):
    fcfg = FIFOConfig(**geometry)
    Q = fcfg.queue_len
    start_qs = fcfg.num_inference_steps - fcfg.l_nf
    for i in range(fcfg.num_iterations if fcfg.num_frames <= 52 else 60):
        qs = max(0, start_qs - i)
        regions = _regions(fcfg, qs)
        covered = np.zeros(Q, dtype=int)
        for _, lo, hi in regions:
            covered[lo:hi] += 1
        # disjoint: no position written by two ranks (psum merge soundness)
        assert covered.max() <= 1, (qs, regions)
        # coverage: every active position from max(r_nf, qs) to the end written
        lo_cov = max(fcfg.r_nf, qs)
        assert (covered[lo_cov:] == 1).all(), (qs, regions)
        # pad region [0, r_nf) is never written once warm-up is over
        if qs == 0:
            assert (covered[:fcfg.r_nf] == 0).all()
        if qs == 0:
            break


def test_emitted_position_is_final_step():
    """The popped frame (index r_nf) must sit at the last timestep with
    prev_t = -1, i.e. be fully denoised at emission."""
    from tokensgen_tpu.core import schedule as S
    from tokensgen_tpu.sampling.fifo import _position_timesteps

    for steps, nf, parts in [(8, 4, 2), (52, 13, 4)]:
        fcfg = FIFOConfig(nf_per_chunk=nf, num_partitions=parts,
                          num_inference_steps=steps, num_frames=nf)
        ts = S.inference_timesteps(S.ScheduleConfig(), steps)
        pos_t, pos_prev, _ = _position_timesteps(ts, fcfg)
        assert pos_t[fcfg.r_nf] == ts[-1]
        assert pos_prev[fcfg.r_nf] == -1
