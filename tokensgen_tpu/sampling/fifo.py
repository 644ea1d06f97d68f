"""FIFO diagonal denoising — TPU-native engine.

Re-implements the algorithm of `cogvideo_fifo_mp_v2`
(`/root/reference/longvgen/fifo_sampling/cogvideo_sampling_mp_fifo.py:27-581`)
as a single SPMD program:

* the latent queue [B, r + steps = 58, C, H, W], the x0 history buffer and its
  validity mask, the per-position (t, prev_t, next_t) vectors, and the rolling
  VIP rotary grids are all **dense HBM-resident arrays**; the reference's Python
  lists-with-None and host<->device queue round-trips disappear,
* one FIFO iteration processes the 2·num_partitions=8 lookahead rank windows —
  either sequentially (`lax.map`, single chip) or fanned out over the mesh
  ``queue`` axis with `shard_map`, the halves merged by an ICI `psum` scatter
  instead of mp.Queue transfers (`:194-334`),
* per-frame DPM steps are one vectorised `dpm_step` call over the window
  (vs the reference's 13-iteration Python loop, `:537-550`),
* adaptive padding's `queue_start_idx` ramp (`:175-189,243-253,358`) becomes
  masked compute: window starts clamp to the ramp and inactive ranks contribute
  nothing (FLOPs traded for static shapes during the 39-iteration warm-up),
* rolling grid bookkeeping (`:84-139`) is index arithmetic into precomputed
  arrays: grid value at (iteration i, queue pos p) = G[i+p],
* the tail frame re-enters the queue through the one-beta renoise
  `add_noise_to_xt(t=999)` (`:117-131`).

Emitted frames: ``num_frames + steps - nf`` iterations, first ``steps - nf``
frames discarded (`:230,367`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map  # jax.shard_map (jax>=0.8)
from jax.sharding import Mesh, PartitionSpec as P

from tokensgen_tpu.core import cfg as cfg_lib
from tokensgen_tpu.core import schedule as S
from tokensgen_tpu.core.rope import Rope, get_3d_rotary_pos_embed_v2_jnp


@dataclasses.dataclass(frozen=True)
class FIFOConfig:
    nf_per_chunk: int = 13
    num_partitions: int = 4
    num_inference_steps: int = 52
    num_frames: int = 52  # output latent frames
    lookahead_denoising: bool = True
    use_adaptive_padding: bool = True
    guidance_scale: float = 6.0
    guidance_scale_img: float = 1.5
    use_dynamic_cfg: bool = False
    use_separate_guidance: bool = False
    do_classifier_free_guidance: bool = True
    stochastic: bool = True
    renoise_timestep: int = 999
    # "xt": one-beta renoise of the recycled tail (mp_v2, `:124-128`);
    # "randn": pure fresh noise (single-device engine, `cogvideo_sampling.py:115-128`)
    tail_renoise_mode: str = "xt"
    # dtype of the stacked emitted-frame buffer ([B, iters, C, H, W]); bf16 halves
    # HBM for very long videos (351 iters at 24 chunks ≈ 2.4 GB in f32)
    emit_dtype: str = "float32"
    vip_rope_dims: Tuple[int, int, int] = (16, 24, 24)
    video_ipadapter_start_frame_idx: int = 1000

    @property
    def l_nf(self) -> int:
        return self.nf_per_chunk - self.nf_per_chunk // 2

    @property
    def r_nf(self) -> int:
        return self.nf_per_chunk // 2

    @property
    def num_ranks(self) -> int:
        return 2 * self.num_partitions if self.lookahead_denoising else self.num_partitions

    @property
    def queue_len(self) -> int:
        return self.r_nf + self.num_inference_steps

    @property
    def num_iterations(self) -> int:
        return self.num_frames + self.num_inference_steps - self.nf_per_chunk


class VIPState(NamedTuple):
    """Extended VIP conditioning arrays (pipeline-prepared, engine-consumed)."""

    image_embeddings: jnp.ndarray  # [nB, Fv_ext, Cv, hq, wq] CFG-batched tokens
    image_grid_t_full: jnp.ndarray  # [queue_len + num_iterations] rolling grid G
    condition_grid_t: jnp.ndarray  # [Fv_ext] extended condition grid (offset +1000)
    image_grid_h: np.ndarray  # static spatial grids (video patch grid)
    image_grid_w: np.ndarray
    condition_grid_h: np.ndarray  # static query grids (8 / 12)
    condition_grid_w: np.ndarray
    vip_nf_per_chunk: int  # 4


class FIFOSeed(NamedTuple):
    fifo_latents: jnp.ndarray  # [B, steps, C, H, W] cleanest-first (base output)
    fifo_old_x0: jnp.ndarray  # [B, steps, C, H, W]
    fifo_old_valid: jnp.ndarray  # [steps] bool
    timesteps: np.ndarray  # [steps] descending
    image_rotary_emb: Rope  # static rope for one 13-frame window
    vip: Optional[VIPState] = None


class FIFOResult(NamedTuple):
    latents: jnp.ndarray  # [B, num_frames, C, H, W] emitted clean frames
    all_emitted: jnp.ndarray  # [B, num_iterations, C, H, W] incl. warm-up
    cache_x0: Optional[jnp.ndarray]  # [n_cache, steps(valid-masked), B, C, H, W]
    cache_valid: Optional[jnp.ndarray]


def _position_timesteps(ts: np.ndarray, fcfg: FIFOConfig):
    """Queue-position-aligned (t, prev_t, next_t): position 0 = cleanest
    (`cogvideo_sampling_mp_fifo.py:182-189` with the flip applied)."""
    r = fcfg.r_nf
    ft = np.concatenate([ts, np.full(r, ts[-1])])
    fp = np.concatenate([ts[1:], np.full(r + 1, -1)])
    fn = np.concatenate([[-1], ts[:-1], np.full(r, ts[-2])])
    return ft[::-1].copy(), fp[::-1].copy(), fn[::-1].copy()


def prepare_queue(seed: FIFOSeed, fcfg: FIFOConfig):
    """Left-pad the seed with r copies of the cleanest entry (`:72-82,145-146`)."""
    r = fcfg.r_nf
    pad = jnp.repeat(seed.fifo_latents[:, :1], r, axis=1)
    queue = jnp.concatenate([pad, seed.fifo_latents], axis=1).astype(jnp.float32)
    pad_x0 = jnp.repeat(seed.fifo_old_x0[:, :1], r, axis=1)
    x0 = jnp.concatenate([pad_x0, seed.fifo_old_x0], axis=1).astype(jnp.float32)
    valid = jnp.concatenate(
        [jnp.repeat(seed.fifo_old_valid[:1], r), seed.fifo_old_valid]
    )
    return queue, x0, valid


def fifo_generate(
    model_fn: Callable,
    params,
    sched: S.DiffusionSchedule,
    fcfg: FIFOConfig,
    seed: FIFOSeed,
    rng: Optional[jax.Array] = None,
    cache_idx: Tuple[int, ...] = (),
    mesh: Optional[Mesh] = None,
    host_loop: bool = False,
    emit_callback: Optional[Callable] = None,
    state_callback: Optional[Callable] = None,
    resume_from: Optional[dict] = None,
) -> FIFOResult:
    """Run the FIFO loop.

    ``model_fn(params, lat_cfg [nB,13,C,H,W], t2d [nB,13], vip_kwargs|None) ->
    noise_pred`` must CFG-batch its closed-over conditioning to match; uncond
    first. ``vip_kwargs`` = {"vip_hidden_states", "vip_image_rotary_emb",
    "vip_condition_rotary_emb"}.

    When ``mesh`` has a non-trivial ``queue`` axis, the rank windows of each
    iteration are sharded over it (one DiT forward per device per iteration,
    merged with psum); otherwise ranks run sequentially on one device.

    ``host_loop=True`` dispatches one jitted program per iteration from the
    host instead of one lax.scan over all iterations — same numerics, bounded
    per-execution duration (needed on runtimes that cap a single execution's
    wall time), per-iteration progress.

    ``emit_callback(i, emitted_np)`` (host_loop only): invoked after each
    iteration's emitted frame lands on the host — lets long tunnel runs
    checkpoint the emission series incrementally so a mid-run failure still
    yields the frames produced so far.

    ``state_callback(i, snapshot)`` (host_loop only): invoked after iteration
    ``i`` with a zero-arg thunk; calling it returns the post-iteration queue
    state as host arrays ``{"iteration": i + 1, "state": (queue, x0_buf,
    x0_valid)}`` — a crash checkpoint. The callback owns the frequency
    decision, and the ~40 MB production state only crosses the tunnel on the
    iterations where the callback calls the thunk (every ~25 iterations is
    free). The thunk must be called synchronously inside the callback — the
    next iteration donates the underlying device buffers. A later call with
    ``resume_from=<a snapshot's return value>``
    (same seed/config) continues from that iteration and reproduces the
    uninterrupted run bit-exactly: the per-iteration keys are recomputed from
    ``rng``, so iteration i's randomness doesn't depend on how the host loop
    was segmented. The returned ``all_emitted``/``latents`` then cover only
    the resumed iterations — the caller stitches them onto its emit
    checkpoint (see ``tests/test_serving.py`` crash-resume drill).
    """
    nf, r_nf, l_nf = fcfg.nf_per_chunk, fcfg.r_nf, fcfg.l_nf
    R, Q = fcfg.num_ranks, fcfg.queue_len
    steps = fcfg.num_inference_steps
    if steps < nf:
        # the queue must hold at least one full window past warm-up; with
        # steps < nf the engine cannot emit num_frames clean frames within
        # num_iterations (`latents = all_emitted[:, steps - nf:]` would slice
        # warm-up frames) — the reference geometry assumes steps >= nf
        raise ValueError(
            f"FIFO requires num_inference_steps >= nf_per_chunk "
            f"({steps} < {nf}): the denoise queue is shorter than one "
            f"frame window")
    ts = np.asarray(seed.timesteps)
    pos_t_np, pos_prev_np, pos_next_np = _position_timesteps(ts, fcfg)
    pos_t = jnp.asarray(pos_t_np)
    pos_prev = jnp.asarray(pos_prev_np)
    pos_next = jnp.asarray(pos_next_np)

    start0 = np.array([nf * (r // 2) + r_nf * (r % 2) for r in range(R)])
    mid = np.array([s + (l_nf if r % 2 == 1 else r_nf) for r, s in enumerate(start0)])
    real_end = start0 + nf

    if fcfg.use_dynamic_cfg:
        g_table = jnp.asarray(cfg_lib.dynamic_scale_table(
            fcfg.guidance_scale, steps, sched.config.num_train_timesteps))
        gi_table = jnp.asarray(cfg_lib.dynamic_scale_table(
            fcfg.guidance_scale_img, steps, sched.config.num_train_timesteps))
    else:
        g_table = gi_table = None

    use_vip = seed.vip is not None
    vip = seed.vip
    if rng is None:
        rng = jax.random.PRNGKey(0)

    dt, dh, dw = fcfg.vip_rope_dims

    # ``params`` is threaded explicitly through every traced function below
    # (never closed over): a closed-over param tree would be baked into the
    # lowered HLO as constants — a multi-GB program upload on remote runtimes
    # for the production DiT, and a recompile per param update when training.
    def rank_windows(params, queue, x0_buf, x0_valid, qs, grid_offset,
                     rank_ids, key):
        """Compute masked merge contributions for the given rank ids.
        Returns (sum_lat [B,Q,...], sum_x0 [B,Q,...], any_mask [Q])."""
        b = queue.shape[0]
        pos = jnp.arange(Q)

        def one_rank(rid):
            s0 = jnp.asarray(start0)[rid]
            m = jnp.asarray(mid)[rid]
            re = jnp.asarray(real_end)[rid]
            active = m > qs
            start = jnp.maximum(s0, qs)
            # warm-up specialization: during the adaptive-padding ramp inactive
            # ranks contribute nothing (mask below is all-False), so the whole
            # DiT forward + DPM step is skipped with a real `lax.cond` — the
            # reference's Python-level rank skip (`cogvideo_sampling_mp_fifo.py:
            # 235-253`), expressed without dynamic shapes.
            return jax.lax.cond(
                active,
                lambda: _one_rank_active(rid, s0, m, re, start),
                lambda: (jnp.zeros_like(queue), jnp.zeros_like(queue),
                         jnp.zeros((Q,), bool)),
            )

        def _one_rank_active(rid, s0, m, re, start):
            active = m > qs

            lat = jax.lax.dynamic_slice_in_dim(queue, start, nf, axis=1)
            old = jax.lax.dynamic_slice_in_dim(x0_buf, start, nf, axis=1)
            oldv = jax.lax.dynamic_slice_in_dim(x0_valid, start, nf, axis=0)
            t_w = jax.lax.dynamic_slice_in_dim(pos_t, start, nf, axis=0)
            p_w = jax.lax.dynamic_slice_in_dim(pos_prev, start, nf, axis=0)
            n_w = jax.lax.dynamic_slice_in_dim(pos_next, start, nf, axis=0)

            vip_kwargs = None
            if use_vip:
                gt = jax.lax.dynamic_slice_in_dim(
                    vip.image_grid_t_full, grid_offset + start, nf, axis=0
                )
                img_rope = get_3d_rotary_pos_embed_v2_jnp(
                    sum(fcfg.vip_rope_dims), gt,
                    jnp.asarray(vip.image_grid_h), jnp.asarray(vip.image_grid_w),
                    dim_t=dt, dim_h=dh, dim_w=dw,
                )
                vs = jnp.searchsorted(
                    vip.condition_grid_t,
                    gt[0] + fcfg.video_ipadapter_start_frame_idx,
                    side="right",
                ) - 1
                n_vip = min(vip.vip_nf_per_chunk + 1, nf)
                cond_gt = jax.lax.dynamic_slice_in_dim(vip.condition_grid_t, vs, n_vip, axis=0)
                cond_rope = get_3d_rotary_pos_embed_v2_jnp(
                    sum(fcfg.vip_rope_dims), cond_gt,
                    jnp.asarray(vip.condition_grid_h), jnp.asarray(vip.condition_grid_w),
                    dim_t=dt, dim_h=dh, dim_w=dw,
                )
                emb = jax.lax.dynamic_slice_in_dim(vip.image_embeddings, vs, n_vip, axis=1)
                vip_kwargs = {
                    "vip_hidden_states": emb,
                    "vip_image_rotary_emb": img_rope,
                    "vip_condition_rotary_emb": cond_rope,
                }

            lat_in = cfg_lib.batch_for_cfg(
                lat, fcfg.do_classifier_free_guidance, fcfg.use_separate_guidance
            )
            t2d = jnp.broadcast_to(t_w[None, :], (lat_in.shape[0], nf))
            noise_pred = model_fn(params, lat_in, t2d, vip_kwargs).astype(jnp.float32)

            if fcfg.do_classifier_free_guidance:
                if g_table is not None:
                    g = g_table[t_w]  # per-frame dynamic CFG (`:518-526`)
                    gi = gi_table[t_w]
                else:
                    g, gi = fcfg.guidance_scale, fcfg.guidance_scale_img
                noise_pred = cfg_lib.combine(noise_pred, g, gi, fcfg.use_separate_guidance)

            # per-frame DPM step, vectorised over the window
            tb = jnp.broadcast_to(t_w[None], (b, nf))
            pb = jnp.broadcast_to(p_w[None], (b, nf))
            nb = jnp.broadcast_to(n_w[None], (b, nf))
            ov = jnp.broadcast_to((oldv & (n_w > 0))[None], (b, nf))
            rkey = jax.random.fold_in(key, rid)
            noise = (jax.random.normal(rkey, lat.shape, jnp.float32)
                     if fcfg.stochastic else None)
            noise2 = (jax.random.normal(jax.random.fold_in(rkey, 1), lat.shape, jnp.float32)
                      if fcfg.stochastic else None)
            new_lat, new_x0 = S.dpm_step(
                sched, noise_pred, lat, tb, pb, t_back=nb,
                old_pred_original_sample=old, old_valid=ov,
                noise=noise, noise2=noise2,
            )

            # merge region (`:322-329`)
            clamped = s0 <= qs
            write_lo = jnp.where(clamped, jnp.maximum(r_nf, qs), m)
            write_hi = jnp.where(clamped, re, s0 + nf)
            mask = active & (pos >= write_lo) & (pos < write_hi)

            scat_l = jnp.zeros_like(queue)
            scat_l = jax.lax.dynamic_update_slice_in_dim(scat_l, new_lat, start, axis=1)
            scat_x = jnp.zeros_like(queue)
            scat_x = jax.lax.dynamic_update_slice_in_dim(scat_x, new_x0, start, axis=1)
            mb = mask.astype(queue.dtype)[None, :, None, None, None]
            return scat_l * mb, scat_x * mb, mask

        # accumulate in-place over ranks (fori_loop) instead of lax.map, whose
        # stacked [R, B, Q, C, H, W] outputs cost ~122 MB of extra HBM at the
        # production shape — part of the round-2 full-depth OOM budget
        def body(idx, acc):
            l, x, m = one_rank(rank_ids[idx])
            return acc[0] + l, acc[1] + x, acc[2] | m

        init = (jnp.zeros_like(queue), jnp.zeros_like(queue),
                jnp.zeros((Q,), bool))
        return jax.lax.fori_loop(0, rank_ids.shape[0], body, init)

    if mesh is not None and mesh.shape.get("queue", 1) > 1:
        nq = mesh.shape["queue"]
        assert R % nq == 0, (R, nq)
        rank_ids_global = jnp.arange(R)

        def sharded_windows(params, queue, x0_buf, x0_valid, qs, grid_offset,
                            rank_ids, key):
            sum_l, sum_x, mask = rank_windows(
                params, queue, x0_buf, x0_valid, qs, grid_offset, rank_ids, key
            )
            sum_l = jax.lax.psum(sum_l, "queue")
            sum_x = jax.lax.psum(sum_x, "queue")
            mask = jax.lax.psum(mask.astype(jnp.int32), "queue") > 0
            return sum_l, sum_x, mask

        param_specs = jax.tree_util.tree_map(lambda _: P(), params)
        windows_fn = shard_map(
            sharded_windows,
            mesh=mesh,
            in_specs=(param_specs, P(), P(), P(), P(), P(), P("queue"), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )

        def merge_contribs(params, queue, x0_buf, x0_valid, qs, grid_offset, key):
            return windows_fn(params, queue, x0_buf, x0_valid, qs, grid_offset,
                              rank_ids_global, key)
    else:
        def merge_contribs(params, queue, x0_buf, x0_valid, qs, grid_offset, key):
            return rank_windows(params, queue, x0_buf, x0_valid, qs,
                                grid_offset, jnp.arange(R), key)

    cache_idx_arr = np.asarray(cache_idx, dtype=np.int64) if cache_idx else None

    def iteration(params, state, inp):
        queue, x0_buf, x0_valid = state
        i, key = inp
        qs = (
            jnp.maximum(0, (steps - l_nf) - i)
            if (fcfg.use_adaptive_padding and fcfg.lookahead_denoising)
            else jnp.asarray(0)
        )

        sum_l, sum_x, mask = merge_contribs(params, queue, x0_buf, x0_valid,
                                            qs, i, key)
        mb = mask[None, :, None, None, None]
        queue = jnp.where(mb, sum_l, queue)
        x0_buf = jnp.where(mb, sum_x, x0_buf)
        x0_valid = x0_valid | mask

        emitted = queue[:, r_nf if fcfg.lookahead_denoising else 0].astype(
            jnp.dtype(fcfg.emit_dtype)
        )

        caches = None
        if cache_idx_arr is not None:
            q_idx = jnp.asarray(cache_idx_arr) + (steps - nf) - i + r_nf
            cvalid = (q_idx >= jnp.maximum(r_nf, qs)) & (q_idx < Q)
            safe = jnp.clip(q_idx, 0, Q - 1)
            cvals = jnp.take(x0_buf, safe, axis=1)  # [B, n_cache, C, H, W]
            caches = (cvals.transpose(1, 0, 2, 3, 4), cvalid)

        # shift + tail renoise (`:117-131`)
        tail = queue[:, -1]
        tail_noise = jax.random.normal(
            jax.random.fold_in(key, 999), tail.shape, jnp.float32)
        if fcfg.tail_renoise_mode == "randn":
            tail = tail_noise
        else:
            tail = S.add_noise_to_xt(
                sched, tail, tail_noise,
                jnp.full((tail.shape[0],), fcfg.renoise_timestep),
            )
        queue = jnp.concatenate([queue[:, 1:], tail[:, None]], axis=1)
        x0_buf = jnp.concatenate([x0_buf[:, 1:], jnp.zeros_like(x0_buf[:, -1:])], axis=1)
        x0_valid = jnp.concatenate([x0_valid[1:], jnp.asarray([False])])

        return (queue, x0_buf, x0_valid), (emitted, caches)

    queue, x0_buf, x0_valid = prepare_queue(seed, fcfg)
    n_iters = fcfg.num_iterations
    keys = jax.random.split(rng, n_iters)
    if host_loop:
        # One jitted program per FIFO iteration, driven from the host, instead
        # of a single lax.scan program covering all n_iters. Numerically
        # identical (same iteration body, same keys); trades ~ms of dispatch
        # per iteration for (a) a bounded single-execution duration — the
        # tunneled single-chip runtime kills executions that run for minutes,
        # which is what broke the 42-layer full-depth e2e, and (b) per-
        # iteration progress. State buffers are donated so HBM usage matches
        # the scan's steady state; params ride as an argument (see above).
        it_fn = jax.jit(iteration, donate_argnums=(1,))
        state = (queue, x0_buf, x0_valid)
        # Emitted frames and cache tracks are OUTPUTS — land each iteration's
        # slice on the host immediately instead of letting n_iters device
        # buffers pile up. At the 42-layer/52-step production shape HBM sits
        # within ~10 MB of the 16 GB edge with the bf16 DiT resident, and the
        # final on-device jnp.stack is exactly what tipped it over; decode
        # runs in a later offload phase (DiT params dropped), so the latents
        # would be re-staged anyway. This holds for the queue-sharded engine
        # too: the shard_map's out_specs are P(), so the per-iteration emit is
        # a replicated [B, C, H, W] slice (~0.3 MB at production shape) and
        # fetching it is what lets the 8-chip deployment STREAM — the
        # reference pops one host frame per iteration the same way
        # (`cogvideo_sampling_mp_fifo.py:340-341`).
        start_i = 0
        if resume_from is not None:
            state = tuple(jnp.asarray(x) for x in resume_from["state"])
            start_i = int(resume_from["iteration"])
        em_list, cx_list, cv_list = [], [], []
        for i in range(start_i, n_iters):
            state, (em, caches_i) = it_fn(
                params, state, (jnp.asarray(i, jnp.int32), keys[i]))
            em_list.append(np.asarray(em))
            if emit_callback is not None:
                emit_callback(i, em_list[-1])
            if caches_i is not None:
                cx_list.append(np.asarray(caches_i[0]))
                cv_list.append(np.asarray(caches_i[1]))
            if state_callback is not None:
                # Lazy snapshot: the ~40 MB production state only crosses the
                # tunnel when the callback actually checkpoints (calls the
                # thunk). Must be called synchronously inside the callback —
                # the next it_fn donates these buffers.
                snap = state

                def _snapshot(j=i, s=snap):
                    return {"iteration": j + 1,
                            "state": tuple(np.asarray(x) for x in s)}

                state_callback(i, _snapshot)
        queue, x0_buf, x0_valid = state
        emitted = np.stack(em_list)
        caches = (np.stack(cx_list), np.stack(cv_list)) if cx_list else None
    else:
        (queue, x0_buf, x0_valid), (emitted, caches) = jax.lax.scan(
            functools.partial(iteration, params),
            (queue, x0_buf, x0_valid), (jnp.arange(n_iters), keys)
        )
    all_emitted = emitted.transpose(1, 0, 2, 3, 4)  # [B, n_iters, C, H, W]
    latents = all_emitted[:, steps - nf:]
    if caches is not None:
        cache_x0, cache_valid = caches  # [n_iters, n_cache, B, ...], [n_iters, n_cache]
        cache_x0 = cache_x0.transpose(1, 0, 2, 3, 4, 5)
        cache_valid = cache_valid.transpose(1, 0)
        return FIFOResult(latents, all_emitted, cache_x0, cache_valid)
    return FIFOResult(latents, all_emitted, None, None)
