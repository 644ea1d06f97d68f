"""8-bit AdamW: quantisation fidelity, memory parity, optimization behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from tokensgen_tpu.train.adam8bit import (
    _dequantize, _quantize, adamw_8bit, state_nbytes,
)


def test_quant_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1000, 7)).astype(np.float32)) * 0.01
    q = _quantize(x)
    back = _dequantize(q, x.shape)
    # blockwise int8: ~1% relative error at block scale
    err = np.abs(np.asarray(back - x)) / (np.abs(np.asarray(x)).max() + 1e-12)
    assert err.max() < 0.02


def test_memory_parity():
    params = {"w": jnp.zeros((512, 512)), "b": jnp.zeros((8,))}
    opt8 = adamw_8bit(1e-3)
    opt32 = optax.adamw(1e-3)
    s8 = opt8.init(params)
    s32 = opt32.init(params)
    n8 = state_nbytes(s8)
    n32 = state_nbytes(s32)
    assert n8 < 0.35 * n32  # ~2.06 bytes/param vs 8


def test_optimizes_quadratic():
    target = jnp.asarray(np.random.default_rng(1).normal(size=(128, 64)), jnp.float32)
    params = {"w": jnp.zeros((128, 64))}

    def loss_fn(p):
        return jnp.mean((p["w"] - target) ** 2)

    opt = adamw_8bit(5e-2, weight_decay=0.0)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for _ in range(200):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < 0.05 * losses[0]


def test_jit_state_structure_stable():
    params = {"w": jnp.zeros((4096,)), "tiny": jnp.zeros((8,))}
    opt = adamw_8bit(1e-3)
    state = opt.init(params)
    # big tensor quantized, tiny one f32
    from tokensgen_tpu.train.adam8bit import _Q

    assert isinstance(state.mu["w"], _Q)
    assert state.mu["w"].q.dtype == jnp.int8
    assert not isinstance(state.mu["tiny"], _Q)

    @jax.jit
    def step(params, state):
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    p2, s2 = step(params, state)
    p3, s3 = step(p2, s2)
    assert jax.tree_util.tree_structure(s2) == jax.tree_util.tree_structure(state)
