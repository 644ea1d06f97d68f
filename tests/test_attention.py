"""Flash-attention wrapper tests (XLA path on CPU; the Pallas kernel itself is
exercised on TPU by bench.py and by interpreter-mode test below)."""

import numpy as np
import jax
import jax.numpy as jnp

from tokensgen_tpu.kernels.attention import flash_attention, _xla_attention


def _ref_attn(q, k, v, bias=None, scale=None):
    d = q.shape[-1]
    scale = scale or d**-0.5
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if bias is not None:
        s = s + bias[:, None, None, :]
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


def test_matches_numpy_reference():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 3, 17, 8)).astype(np.float32)
    k = rng.normal(size=(2, 3, 29, 8)).astype(np.float32)
    v = rng.normal(size=(2, 3, 29, 8)).astype(np.float32)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), _ref_attn(q, k, v), rtol=1e-4, atol=1e-5)


def test_key_bias_masks_keys():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(1, 2, 5, 8)).astype(np.float32)
    k = rng.normal(size=(1, 2, 7, 8)).astype(np.float32)
    v = rng.normal(size=(1, 2, 7, 8)).astype(np.float32)
    bias = np.zeros((1, 7), np.float32)
    bias[0, 4:] = -1e9
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), key_bias=jnp.asarray(bias))
    ref = _ref_attn(q[:, :, :, :], k[:, :, :4], v[:, :, :4])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_custom_scale():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(1, 1, 4, 16)).astype(np.float32)
    k = rng.normal(size=(1, 1, 4, 16)).astype(np.float32)
    v = rng.normal(size=(1, 1, 4, 16)).astype(np.float32)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=0.25)
    np.testing.assert_allclose(np.asarray(out), _ref_attn(q, k, v, scale=0.25), rtol=1e-4, atol=1e-5)


def test_pallas_kernel_interpret_mode():
    """Run the actual Pallas kernel in interpreter mode on CPU against XLA ref."""
    import functools
    from jax.experimental import pallas as pl
    from tokensgen_tpu.kernels import attention as A

    rng = np.random.default_rng(3)
    b, h, sq, skv, d = 1, 2, 256, 512, 64
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, skv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, skv, d)).astype(np.float32))
    bias = jnp.zeros((b, 1, skv), jnp.float32)
    scale = d**-0.5

    from jax.experimental.pallas import tpu as pltpu

    block_q, block_kv = 128, 256
    hblk = 2  # two heads per grid step (the production configuration)
    grid = (b, h // hblk, sq // block_q, skv // block_kv)
    # the wrapper's pre-processing: fold scale*log2e into q, transpose k,
    # pre-scale the bias into the exp2 domain
    q_in = q * (scale * A._LOG2E)
    kt = k.transpose(0, 1, 3, 2)
    bias_in = bias * A._LOG2E
    out = pl.pallas_call(
        functools.partial(A._flash_kernel, hblk=hblk, has_bias=True),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hblk, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, hblk, d, block_kv), lambda b_, h_, i, j: (b_, h_, 0, j)),
            pl.BlockSpec((1, hblk, block_kv, d), lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_kv), lambda b_, h_, i, j: (b_, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, hblk, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((hblk * block_q, A._LANES), jnp.float32),
            pltpu.VMEM((hblk * block_q, A._LANES), jnp.float32),
            pltpu.VMEM((hblk * block_q, d), jnp.float32),
        ],
        interpret=True,
    )(q_in, kt, v, bias_in)
    ref = A._xla_attention(q, k, v, bias[:, 0, :], scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_tp_axis_shard_map_matches_unsharded():
    """flash_attention(tp_axis=...) shard_maps itself over heads; output must
    equal the unsharded op (incl. the key-bias path) on a model-axis mesh."""
    from tokensgen_tpu.sharding import MeshSpec, make_mesh

    rng = np.random.default_rng(0)
    b, h, s, d = 2, 4, 16, 8
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    bias = jnp.where(jnp.arange(s)[None] < 12, 0.0, -1e9).astype(jnp.float32)
    bias = jnp.broadcast_to(bias, (b, s))
    ref = flash_attention(q, k, v, key_bias=bias)

    mesh = make_mesh(MeshSpec(data=1, queue=1, model=4))
    with jax.set_mesh(mesh):
        out = jax.jit(
            lambda q, k, v, bias: flash_attention(q, k, v, key_bias=bias, tp_axis="model")
        )(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_blocked_backward_matches_autodiff():
    """The custom-vjp backward for the Pallas kernel (flash-style blocked XLA
    recompute) must match autodiff through the dense reference attention."""
    from tokensgen_tpu.kernels.attention import _blocked_attention_bwd

    rng = np.random.default_rng(0)
    b, h, sq, skv, d = 2, 3, 70, 50, 16  # non-multiples exercise q-padding
    scale = 0.17
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, skv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, skv, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(b, skv)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, h, sq, d)), jnp.float32)

    out, vjp = jax.vjp(lambda q, k, v, bias: _xla_attention(q, k, v, bias, scale),
                       q, k, v, bias)
    dq_ref, dk_ref, dv_ref, dbias_ref = vjp(g)
    dq, dk, dv, dbias = _blocked_attention_bwd(q, k, v, bias, out, g, scale)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(dbias_ref), rtol=2e-4, atol=2e-4)


def test_fused_prologue_kernel_interpret_mode():
    """Run the fused qk-norm+rope 4-D kernel in interpreter mode on CPU against
    the XLA prologue + attention reference."""
    from tokensgen_tpu.kernels import attention as A

    rng = np.random.default_rng(7)
    b, h, sq, skv, d = 1, 2, 256, 512, 64
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, skv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, skv, d)).astype(np.float32))
    bias = jnp.zeros((b, skv), jnp.float32)
    g = jnp.asarray(np.abs(rng.normal(size=(d,))).astype(np.float32))
    bq_ = jnp.asarray((0.1 * rng.normal(size=(d,))).astype(np.float32))
    cos, sin = np.cos(rng.normal(size=(skv, d))), np.sin(rng.normal(size=(skv, d)))
    # a fake rope table over the tail positions; identity over a text prefix
    rope_q = (jnp.asarray(cos[:sq - 32].astype(np.float32)),
              jnp.asarray(sin[:sq - 32].astype(np.float32)))
    rope_k = (jnp.asarray(cos.astype(np.float32)[:skv - 32]),
              jnp.asarray(sin.astype(np.float32)[:skv - 32]))
    scale = d**-0.5
    tq = A.make_prologue(d, [(None, 32), (rope_q, sq - 32)], g, bq_, fold=scale)
    tk = A.make_prologue(d, [(None, 32), (rope_k, skv - 32)], g, bq_)
    out = A._flash_fused_tpu(q, k, v, bias, tq, tk, 128, 256, False, 1e-6,
                             True, True, interpret=True)
    ref = A._xla_attention_fused(q, k, v, bias, tq, tk, 1e-6, True, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_packed_headpair_kernel_interpret_mode():
    """Run the packed head-pair kernel (production TPU path) in interpreter
    mode on CPU: merged [B,S,H*D] operands, block-diagonal matmuls."""
    from tokensgen_tpu.kernels import attention as A

    rng = np.random.default_rng(8)
    b, h, sq, skv, d = 1, 4, 256, 512, 64
    qm = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    km = jnp.asarray(rng.normal(size=(b, skv, h * d)).astype(np.float32))
    vm = jnp.asarray(rng.normal(size=(b, skv, h * d)).astype(np.float32))
    bias = np.zeros((b, skv), np.float32)
    bias[0, skv - 17:] = -1e9  # real key mask exercises the bias path
    bias = jnp.asarray(bias)
    g = jnp.asarray(np.abs(rng.normal(size=(d,))).astype(np.float32))
    bq_ = jnp.asarray((0.1 * rng.normal(size=(d,))).astype(np.float32))
    ang_q = rng.normal(size=(sq, d)).astype(np.float32)
    ang_k = rng.normal(size=(skv, d)).astype(np.float32)
    rope_q = (jnp.asarray(np.cos(ang_q)), jnp.asarray(np.sin(ang_q)))
    rope_k = (jnp.asarray(np.cos(ang_k)), jnp.asarray(np.sin(ang_k)))
    scale = d**-0.5
    tq = A.make_prologue(d, [(rope_q, sq)], g, bq_, fold=scale)
    tk = A.make_prologue(d, [(rope_k, skv)], g, bq_)
    out = A._flash_fused_packed_tpu(qm, km, vm, bias, tq, tk, h, 128, 256,
                                    True, 1e-6, True, True, interpret=True)
    ref4 = A._xla_attention_fused(A._split3(qm, h), A._split3(km, h),
                                  A._split3(vm, h), bias, tq, tk, 1e-6,
                                  True, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(A._merge3(ref4)),
                               rtol=2e-4, atol=2e-4)


def test_packed_headpair_int8_scores_interpret_mode():
    """int8 score-matmul turbo (quant_attn): the packed kernel with
    int8_scores=True in interpreter mode vs the f32 XLA reference. int8
    quantization of the qk-normed q/k adds ~1e-2-scale error on O(1)
    outputs — in family with the bf16 kernel's own noise at production
    shapes (PERF.md)."""
    from tokensgen_tpu.kernels import attention as A

    rng = np.random.default_rng(8)
    b, h, sq, skv, d = 1, 4, 256, 512, 64
    qm = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    km = jnp.asarray(rng.normal(size=(b, skv, h * d)).astype(np.float32))
    vm = jnp.asarray(rng.normal(size=(b, skv, h * d)).astype(np.float32))
    bias = np.zeros((b, skv), np.float32)
    bias[0, skv - 17:] = -1e9  # key mask exercises the bias path
    bias = jnp.asarray(bias)
    g = jnp.asarray(np.abs(rng.normal(size=(d,))).astype(np.float32))
    bq_ = jnp.asarray((0.1 * rng.normal(size=(d,))).astype(np.float32))
    ang_q = rng.normal(size=(sq, d)).astype(np.float32)
    ang_k = rng.normal(size=(skv, d)).astype(np.float32)
    rope_q = (jnp.asarray(np.cos(ang_q)), jnp.asarray(np.sin(ang_q)))
    rope_k = (jnp.asarray(np.cos(ang_k)), jnp.asarray(np.sin(ang_k)))
    tq = A.make_prologue(d, [(rope_q, sq)], g, bq_, fold=d**-0.5)
    tk = A.make_prologue(d, [(rope_k, skv)], g, bq_)
    out = A._flash_fused_packed_tpu(qm, km, vm, bias, tq, tk, h, 128, 256,
                                    True, 1e-6, True, True, interpret=True,
                                    int8_scores=True)
    ref = A._merge3(A._xla_attention_fused(
        A._split3(qm, h), A._split3(km, h), A._split3(vm, h), bias, tq, tk,
        1e-6, True, True))
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.max() < 6e-2, err.max()
    assert err.mean() < 5e-3, err.mean()


def test_cross_small_side_kernels_interpret_mode():
    """The pair-innermost cross-attention kernels (smallkv: tv->vip; smallq:
    vip->all) in interpreter mode against the XLA prologue+attention
    reference, including padded-key masking via the folded bias."""
    from tokensgen_tpu.kernels import attention as A

    rng = np.random.default_rng(12)
    b, h, d = 1, 4, 64
    g = jnp.asarray(np.abs(rng.normal(size=(d,))).astype(np.float32))
    bq_ = jnp.asarray((0.1 * rng.normal(size=(d,))).astype(np.float32))

    def tabs(s, fold=None):
        ang = rng.normal(size=(s, d)).astype(np.float32)
        rope = (jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang)))
        kw = {"fold": fold} if fold else {}
        return A.make_prologue(d, [(rope, s)], g, bq_, **kw)

    # smallkv: long q, tiny (non-128-multiple -> padded+masked) kv
    sq, skv = 640, 96
    qm = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    km = jnp.asarray(rng.normal(size=(b, skv, h * d)).astype(np.float32))
    vm = jnp.asarray(rng.normal(size=(b, skv, h * d)).astype(np.float32))
    bias = jnp.zeros((b, skv), jnp.float32)
    tq, tk = tabs(sq, fold=d**-0.5), tabs(skv)
    out = A._flash_cross_smallkv_tpu(qm, km, vm, bias, tq, tk, h, 256,
                                     1e-6, True, True, interpret=True)
    ref = A._merge3(A._xla_attention_fused(
        A._split3(qm, h), A._split3(km, h), A._split3(vm, h), bias, tq, tk,
        1e-6, True, True))
    # these fake tables (random angles, no real rotation structure) give a
    # loose folded score bound, so the max-free exp2 runs deep below 1.0 and
    # f32 roundoff grows to ~5e-4 (real rope tables bound much tighter)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=6e-4, atol=6e-4)

    # smallq: tiny q, long kv swept in blocks
    sq2, skv2 = 96, 640
    qm2 = jnp.asarray(rng.normal(size=(b, sq2, h * d)).astype(np.float32))
    km2 = jnp.asarray(rng.normal(size=(b, skv2, h * d)).astype(np.float32))
    vm2 = jnp.asarray(rng.normal(size=(b, skv2, h * d)).astype(np.float32))
    bias2 = np.zeros((b, skv2), np.float32)
    bias2[0, skv2 - 9:] = -1e9  # real key mask through the bias path
    bias2 = jnp.asarray(bias2)
    tq2, tk2 = tabs(sq2, fold=d**-0.5), tabs(skv2)
    out2 = A._flash_cross_smallq_tpu(qm2, km2, vm2, bias2, tq2, tk2, h, 256,
                                     1e-6, True, True, interpret=True)
    ref2 = A._merge3(A._xla_attention_fused(
        A._split3(qm2, h), A._split3(km2, h), A._split3(vm2, h), bias2,
        tq2, tk2, 1e-6, True, True))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=2e-4, atol=2e-4)


def test_packed_bwd_kernel_interpret_mode():
    """The packed Pallas backward (VMEM-resident logits) against jax.vjp of
    the XLA attention on prologued inputs, including the key-bias grad."""
    from tokensgen_tpu.kernels import attention as A

    rng = np.random.default_rng(11)
    b, h, sq, skv, d = 1, 4, 256, 384, 64
    qn = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    kn = jnp.asarray(rng.normal(size=(b, skv, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, skv, h * d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(b, sq, h * d)).astype(np.float32))
    bias = np.zeros((b, skv), np.float32)
    bias[0, skv - 9:] = -1e9
    bias = jnp.asarray(bias)

    def f(qn_, kn_, v_, bias_):
        out4 = A._xla_attention(A._split3(qn_, h), A._split3(kn_, h),
                                A._split3(v_, h), bias_, 1.0)
        return A._merge3(out4)

    out, vjp = jax.vjp(f, qn, kn, v, bias)
    dq_ref, dk_ref, dv_ref, dbias_ref = vjp(g)

    # lse/dsum exactly as the forward kernel would save them
    s = jnp.einsum("bhqd,bhkd->bhqk", A._split3(qn, h).astype(jnp.float32),
                   A._split3(kn, h).astype(jnp.float32)) + bias[:, None, None, :]
    lse4 = jax.nn.logsumexp(s, axis=-1)  # [B, H, Sq]
    hp = h // 2
    bq = 128
    sq_p = sq
    lse = lse4.reshape(b, hp, 2, sq)
    dsum = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
                   keepdims=True)
    dsum = (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
        b, sq, hp, 2, d).sum(-1).transpose(0, 2, 3, 1)

    dqn, dkn, dvm, dbias = A._flash_packed_bwd_tpu(
        qn, kn, v, g, lse, dsum, bias, h, bq, 128, True, interpret=True)
    np.testing.assert_allclose(np.asarray(dqn), np.asarray(dq_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dkn), np.asarray(dk_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dvm), np.asarray(dv_ref),
                               rtol=2e-4, atol=2e-4)
    # padded/-1e9 keys get ~0 grad; compare the finite-bias positions
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(dbias_ref),
                               rtol=2e-4, atol=2e-4)


def test_packed_kernel_extreme_norm_scales_stay_finite():
    """Pathological qk-norm scales blow past the score-bound clip; the packed
    kernel must stay finite (exponent clamp) and still match the XLA math."""
    from tokensgen_tpu.kernels import attention as A

    rng = np.random.default_rng(12)
    b, h, s, d = 1, 2, 256, 64
    q = jnp.asarray(rng.normal(size=(b, s, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h * d)).astype(np.float32))
    g = jnp.full((d,), 50.0, jnp.float32)  # bound >> the 120 clip
    bs_ = jnp.zeros((d,), jnp.float32)
    tq = A.make_prologue(d, [(None, s)], g, bs_, fold=d**-0.5)
    tk = A.make_prologue(d, [(None, s)], g, bs_)
    out = A._flash_fused_packed_tpu(q, k, v, jnp.zeros((b, s), jnp.float32),
                                    tq, tk, h, 128, 128, False, 1e-6,
                                    True, True, interpret=True)
    # scores here genuinely exceed the 120 clip (bound ~2900), so the
    # softmax IS distorted for the extreme rows — the guarantee under test is
    # only that the clamp keeps everything finite (no exp2 overflow -> NaN)
    assert np.isfinite(np.asarray(out)).all()


def test_packed_kernel_all_negative_rows_stay_finite():
    """The other side of the clip: rows whose every shifted score underflows
    exp2 to 0 (all-negative scores under a near-clip bound C) must not divide
    by l=0 — the denominator floor degrades those rows to 0, not NaN."""
    from tokensgen_tpu.kernels import attention as A

    rng = np.random.default_rng(21)
    b, h, s, d = 1, 2, 256, 64
    # keys ~identical up to noise, queries = -keys: after LN the score of every
    # (q_i, k_j) is ~ -||u||^2 * fold << -C for ALL keys of every row
    base = rng.normal(size=(1, 1, h * d)).astype(np.float32)
    k = jnp.asarray(base + 1e-3 * rng.normal(size=(b, s, h * d)).astype(np.float32))
    q = -k
    v = jnp.asarray(rng.normal(size=(b, s, h * d)).astype(np.float32))
    g = jnp.full((d,), 50.0, jnp.float32)  # bound clips at 120
    bs_ = jnp.zeros((d,), jnp.float32)
    tq = A.make_prologue(d, [(None, s)], g, bs_, fold=d**-0.5)
    tk = A.make_prologue(d, [(None, s)], g, bs_)
    out = A._flash_fused_packed_tpu(q, k, v, jnp.zeros((b, s), jnp.float32),
                                    tq, tk, h, 128, 128, False, 1e-6,
                                    True, True, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    # the lse output of the training path must be finite too (log of floored l)
    out2, lse = A._flash_fused_packed_tpu(
        q, k, v, jnp.zeros((b, s), jnp.float32), tq, tk, h, 128, 128, False,
        1e-6, True, True, interpret=True, with_lse=True)
    assert np.isfinite(np.asarray(out2)).all()
    assert np.isfinite(np.asarray(lse)).all()


def test_packed_kernel_batched_tables_interpret_mode():
    """Per-sample rope tables ([B, S, D], the FIFO's traced-grid case) drive a
    different BlockSpec index map in the packed kernel — exercise it."""
    from tokensgen_tpu.kernels import attention as A

    rng = np.random.default_rng(13)
    b, h, s, d = 2, 4, 256, 64
    qm = jnp.asarray(rng.normal(size=(b, s, h * d)).astype(np.float32))
    km = jnp.asarray(rng.normal(size=(b, s, h * d)).astype(np.float32))
    vm = jnp.asarray(rng.normal(size=(b, s, h * d)).astype(np.float32))
    g = jnp.asarray(np.abs(rng.normal(size=(d,))).astype(np.float32))
    bs_ = jnp.asarray((0.1 * rng.normal(size=(d,))).astype(np.float32))
    ang = rng.normal(size=(b, s, d)).astype(np.float32)  # differs per sample
    rope = (jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang)))
    scale = d**-0.5
    tq = A.make_prologue(d, [(rope, s)], g, bs_, fold=scale)
    tk = A.make_prologue(d, [(rope, s)], g, bs_)
    assert tq[0].ndim == 3  # batched tables
    out = A._flash_fused_packed_tpu(qm, km, vm, jnp.zeros((b, s), jnp.float32),
                                    tq, tk, h, 128, 128, False, 1e-6,
                                    True, True, interpret=True)
    ref4 = A._xla_attention_fused(A._split3(qm, h), A._split3(km, h),
                                  A._split3(vm, h),
                                  jnp.zeros((b, s), jnp.float32),
                                  tq, tk, 1e-6, True, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(A._merge3(ref4)),
                               rtol=2e-4, atol=2e-4)
