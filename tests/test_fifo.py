"""FIFO engine integration tests (SURVEY §4 item 3): frame-emission schedule and
timestep bookkeeping, using an exact-v-prediction oracle model.

Geometry: steps=8, nf_per_chunk=4, partitions=2 -> queue length 10, 4 lookahead
ranks, 12 iterations for 8 output frames (first 4 discarded) — the same structure
as the reference's 52/13/4 at test scale."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tokensgen_tpu.core import schedule as S
from tokensgen_tpu.sampling import base as B
from tokensgen_tpu.sampling import fifo as F


STEPS, NF, PARTS = 8, 4, 2


@pytest.fixture(scope="module")
def setup():
    sched = S.make_schedule(S.ScheduleConfig())
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.normal(size=(1, 1, 2, 4, 4)), jnp.float32)  # x0 per frame

    def perfect_model(params, lat_cfg, t2d, vip_kwargs=None):
        """Exact v for x0=target at each frame's own timestep."""
        ap = sched.alphas_cumprod[jnp.clip(t2d, 0, 999)]
        ap = ap[:, :, None, None, None]
        # v = (sqrt(a)*x - x0) / sqrt(1-a)
        return (ap**0.5 * lat_cfg - target) / (1 - ap) ** 0.5

    def base_model(lat_cfg, tvec):
        return perfect_model(None, lat_cfg, tvec[:, None] * jnp.ones((1, lat_cfg.shape[1]), jnp.int32), None)

    return sched, target, perfect_model, base_model


def _make_seed(sched, base_model, f=NF):
    scfg = B.SamplerConfig(num_inference_steps=STEPS, collect_fifo=True,
                           stochastic=False, do_classifier_free_guidance=False)
    rng = np.random.default_rng(1)
    lat0 = jnp.asarray(rng.normal(size=(1, f, 2, 4, 4)), jnp.float32)
    res = B.denoise(base_model, sched, scfg, lat0)
    ts = S.inference_timesteps(sched.config, STEPS)
    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    rope = get_3d_rotary_pos_embed_v2(16, np.arange(f), np.arange(2), np.arange(2))
    return F.FIFOSeed(
        fifo_latents=res.fifo_latents,
        fifo_old_x0=res.fifo_old_x0,
        fifo_old_valid=res.fifo_old_valid,
        timesteps=ts,
        image_rotary_emb=rope,
    )


def _fcfg(**kw):
    defaults = dict(
        nf_per_chunk=NF, num_partitions=PARTS, num_inference_steps=STEPS,
        num_frames=8, do_classifier_free_guidance=False, stochastic=False,
    )
    defaults.update(kw)
    return F.FIFOConfig(**defaults)


def test_geometry():
    fcfg = _fcfg()
    assert fcfg.queue_len == 10
    assert fcfg.num_ranks == 4
    assert fcfg.num_iterations == 12
    assert (fcfg.l_nf, fcfg.r_nf) == (2, 2)


def test_position_timesteps():
    sched = S.make_schedule(S.ScheduleConfig())
    ts = S.inference_timesteps(sched.config, STEPS)
    pos_t, pos_prev, pos_next = F._position_timesteps(ts, _fcfg())
    assert len(pos_t) == 10
    # position 0..r_nf-1: cleanest timestep, no prev
    assert pos_t[0] == ts[-1] and pos_t[2] == ts[-1]
    assert pos_prev[0] == -1 and pos_prev[2] == -1
    # last position: noisiest, prev is the second timestep, no history
    assert pos_t[-1] == ts[0]
    assert pos_prev[-1] == ts[1]
    assert pos_next[-1] == -1
    # interior consistency: each position's prev equals the next position's... t
    for p in range(3, 9):
        assert pos_prev[p] == pos_t[p - 1]
        assert pos_next[p] == pos_t[p + 1]


def test_fifo_emits_converged_frames(setup):
    sched, target, perfect_model, base_model = setup
    seed = _make_seed(sched, base_model)
    fcfg = _fcfg()
    res = F.fifo_generate(perfect_model, None, sched, fcfg, seed)
    assert res.all_emitted.shape == (1, 12, 2, 4, 4)
    assert res.latents.shape == (1, 8, 2, 4, 4)
    out = np.asarray(res.latents)
    tgt = np.asarray(target)[0, 0]
    # every emitted (post-warm-up) frame must have been driven to the oracle x0
    for f_idx in range(8):
        np.testing.assert_allclose(out[0, f_idx], tgt, atol=2e-3, rtol=0)


def test_fifo_sharded_matches_single_device(setup):
    from tokensgen_tpu.sharding import MeshSpec, make_mesh

    sched, target, perfect_model, base_model = setup
    seed = _make_seed(sched, base_model)
    fcfg = _fcfg()
    res1 = F.fifo_generate(perfect_model, None, sched, fcfg, seed)
    mesh = make_mesh(MeshSpec(data=1, queue=4))
    res2 = F.fifo_generate(perfect_model, None, sched, fcfg, seed, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(res1.all_emitted), np.asarray(res2.all_emitted), rtol=1e-4, atol=1e-5
    )


def test_fifo_cache_tracks(setup):
    sched, target, perfect_model, base_model = setup
    seed = _make_seed(sched, base_model)
    fcfg = _fcfg()
    res = F.fifo_generate(perfect_model, None, sched, fcfg, seed, cache_idx=(0, 3))
    assert res.cache_x0.shape[0] == 2
    assert res.cache_valid.shape == (2, 12)
    # each cache track has some valid captures, and valid captures are near target
    for c in range(2):
        v = np.asarray(res.cache_valid)[c]
        assert v.sum() > 0
        vals = np.asarray(res.cache_x0)[c][v]
        # late captures approach the oracle
        np.testing.assert_allclose(vals[-1][0], np.asarray(target)[0, 0], atol=5e-3)


def test_fifo_host_loop_matches_scan(setup):
    """host_loop=True (per-iteration jitted dispatch) is bit-for-bit the
    lax.scan path: same iteration body, same per-iteration keys."""
    sched, target, perfect_model, base_model = setup
    seed = _make_seed(sched, base_model)
    fcfg = _fcfg(stochastic=True)
    r = jax.random.PRNGKey(7)
    res1 = F.fifo_generate(perfect_model, None, sched, fcfg, seed, rng=r,
                           cache_idx=(0, 3))
    res2 = F.fifo_generate(perfect_model, None, sched, fcfg, seed, rng=r,
                           cache_idx=(0, 3), host_loop=True)
    np.testing.assert_allclose(
        np.asarray(res1.all_emitted), np.asarray(res2.all_emitted),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(res1.cache_valid), np.asarray(res2.cache_valid))
    np.testing.assert_allclose(
        np.asarray(res1.cache_x0), np.asarray(res2.cache_x0),
        rtol=1e-5, atol=1e-6)


def test_fifo_stochastic_runs(setup):
    sched, target, perfect_model, base_model = setup
    seed = _make_seed(sched, base_model)
    fcfg = _fcfg(stochastic=True)
    res = F.fifo_generate(perfect_model, None, sched, fcfg, seed, rng=jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(res.latents)).all()


def test_fifo_rejects_short_queue(setup):
    """steps < nf_per_chunk cannot emit num_frames clean frames (the latents
    slice would return warm-up frames); the engine must refuse loudly."""
    sched, target, perfect_model, base_model = setup
    seed = _make_seed(sched, base_model)
    fcfg = _fcfg(num_inference_steps=NF - 1)
    with pytest.raises(ValueError, match="num_inference_steps >= nf_per_chunk"):
        F.fifo_generate(perfect_model, None, sched, fcfg, seed)
