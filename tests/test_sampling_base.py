"""Base denoise loop: FIFO seed bookkeeping and scheduler integration (tiny model
stub — the loop semantics, not the network, are under test)."""

import numpy as np
import jax
import jax.numpy as jnp

from tokensgen_tpu.core import schedule as S
from tokensgen_tpu.sampling import base as B


def _stub_model(latents_cfg, tvec):
    # pretend v-prediction: push towards zero; uncond/cond halves differ slightly
    n = latents_cfg.shape[0]
    out = 0.1 * latents_cfg
    return out


def test_denoise_shapes_and_fifo_seed():
    sched = S.make_schedule(S.ScheduleConfig())
    scfg = B.SamplerConfig(num_inference_steps=8, collect_fifo=True, stochastic=False)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(1, 5, 4, 6, 6)), jnp.float32)
    res = jax.jit(
        lambda l: B.denoise(_stub_model, sched, scfg, l)
    )(lat)
    assert res.latents.shape == lat.shape
    assert res.fifo_latents.shape == (1, 8, 4, 6, 6)
    assert res.fifo_old_x0.shape == (1, 8, 4, 6, 6)
    assert res.fifo_old_valid.shape == (8,)
    # newest-first ordering: only the LAST seed (noisiest, entry of step 0) has no
    # x0 history
    valid = np.asarray(res.fifo_old_valid)
    assert valid[-1] == False  # noqa: E712
    assert valid[:-1].all()
    assert np.isfinite(np.asarray(res.latents)).all()


def test_fifo_seed_first_snapshot_is_initial_noise_frame():
    """Seed index -1 (prepend order) is the frame F-1 of the *initial* latents."""
    sched = S.make_schedule(S.ScheduleConfig())
    scfg = B.SamplerConfig(num_inference_steps=6, collect_fifo=True, stochastic=False,
                           do_classifier_free_guidance=False)
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.normal(size=(1, 3, 2, 4, 4)), jnp.float32)
    res = B.denoise(_stub_model, sched, scfg, lat)
    np.testing.assert_allclose(
        np.asarray(res.fifo_latents)[0, -1], np.asarray(lat)[0, 2], rtol=1e-5
    )


def test_ddim_vs_dpm_paths_run():
    sched = S.make_schedule(S.ScheduleConfig())
    rng = np.random.default_rng(2)
    lat = jnp.asarray(rng.normal(size=(1, 2, 2, 4, 4)), jnp.float32)
    for scheduler in ("ddim", "dpm"):
        scfg = B.SamplerConfig(num_inference_steps=4, scheduler=scheduler,
                               stochastic=False)
        res = B.denoise(_stub_model, sched, scfg, lat)
        assert np.isfinite(np.asarray(res.latents)).all()


def test_dynamic_cfg_and_separate_guidance():
    sched = S.make_schedule(S.ScheduleConfig())
    rng = np.random.default_rng(3)
    lat = jnp.asarray(rng.normal(size=(1, 2, 2, 4, 4)), jnp.float32)
    scfg = B.SamplerConfig(num_inference_steps=4, use_dynamic_cfg=True,
                           use_separate_guidance=True, stochastic=False)
    res = B.denoise(_stub_model, sched, scfg, lat)
    assert np.isfinite(np.asarray(res.latents)).all()


def test_stochastic_noise_reproducible():
    sched = S.make_schedule(S.ScheduleConfig())
    rng = np.random.default_rng(4)
    lat = jnp.asarray(rng.normal(size=(1, 2, 2, 4, 4)), jnp.float32)
    scfg = B.SamplerConfig(num_inference_steps=4, stochastic=True)
    r1 = B.denoise(_stub_model, sched, scfg, lat, rng=jax.random.PRNGKey(7))
    r2 = B.denoise(_stub_model, sched, scfg, lat, rng=jax.random.PRNGKey(7))
    r3 = B.denoise(_stub_model, sched, scfg, lat, rng=jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(r1.latents), np.asarray(r2.latents))
    assert not np.allclose(np.asarray(r1.latents), np.asarray(r3.latents))


def test_host_loop_matches_scan():
    """host_loop=True (per-step jitted dispatch) reproduces the lax.scan path
    exactly, including the FIFO seed snapshots and the caller's latents buffer
    surviving donation."""
    sched = S.make_schedule(S.ScheduleConfig())
    scfg = B.SamplerConfig(num_inference_steps=8, collect_fifo=True,
                           stochastic=True)
    rng = np.random.default_rng(3)
    lat = jnp.asarray(rng.normal(size=(1, 5, 4, 6, 6)), jnp.float32)
    r = jax.random.PRNGKey(11)
    res1 = B.denoise(_stub_model, sched, scfg, lat, rng=r)
    res2 = B.denoise(_stub_model, sched, scfg, lat, rng=r, host_loop=True)
    np.testing.assert_allclose(np.asarray(res1.latents),
                               np.asarray(res2.latents), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res1.fifo_latents),
                               np.asarray(res2.fifo_latents),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(res1.fifo_old_valid),
                                  np.asarray(res2.fifo_old_valid))
    # the input buffer must still be readable (donation must not eat it)
    assert np.isfinite(np.asarray(lat)).all()


def test_host_loop_model_consts_threading():
    """model_consts rides as a traced argument of the per-step program (the
    anti-closure-baking path the pipeline uses for real params)."""
    sched = S.make_schedule(S.ScheduleConfig())
    scfg = B.SamplerConfig(num_inference_steps=4, stochastic=False)
    rng = np.random.default_rng(4)
    lat = jnp.asarray(rng.normal(size=(1, 3, 2, 4, 4)), jnp.float32)
    w = jnp.asarray(0.1)

    def mc_model(mc, latents_cfg, tvec):
        return mc["w"] * latents_cfg

    res1 = B.denoise(mc_model, sched, scfg, lat, model_consts={"w": w})
    res2 = B.denoise(mc_model, sched, scfg, lat, model_consts={"w": w},
                     host_loop=True)
    np.testing.assert_allclose(np.asarray(res1.latents),
                               np.asarray(res2.latents), rtol=1e-6, atol=1e-7)
