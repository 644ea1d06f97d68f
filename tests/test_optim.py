"""LR schedules + optimizer factory (reference `get_optimizer` /
diffusers `get_scheduler` surface, `train_cogvideo_to2v.py:1056-1136,1558`)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tokensgen_tpu.train import optim


def _eval(s, step):
    return float(s(step)) if callable(s) else float(s)


def test_constant():
    s = optim.lr_schedule("constant", 2e-4)
    assert _eval(s, 0) == pytest.approx(2e-4)
    assert _eval(s, 999) == pytest.approx(2e-4)


def test_constant_with_warmup():
    s = optim.lr_schedule("constant_with_warmup", 1.0, warmup_steps=10,
                          total_steps=100)
    assert _eval(s, 0) == pytest.approx(0.0)
    assert _eval(s, 5) == pytest.approx(0.5)
    assert _eval(s, 50) == pytest.approx(1.0)


def test_linear_decays_to_zero():
    s = optim.lr_schedule("linear", 1.0, warmup_steps=10, total_steps=110)
    assert _eval(s, 10) == pytest.approx(1.0)
    assert _eval(s, 60) == pytest.approx(0.5)
    assert _eval(s, 110) == pytest.approx(0.0, abs=1e-6)


def test_cosine_and_restarts():
    s = optim.lr_schedule("cosine", 1.0, total_steps=100)
    assert _eval(s, 0) == pytest.approx(1.0)
    assert _eval(s, 50) == pytest.approx(0.5, abs=1e-6)
    assert _eval(s, 100) == pytest.approx(0.0, abs=1e-6)
    r = optim.lr_schedule("cosine_with_restarts", 1.0, total_steps=100,
                          num_cycles=2)
    assert _eval(r, 50) == pytest.approx(1.0)  # restart
    assert _eval(r, 25) == pytest.approx(0.5, abs=1e-6)


def test_polynomial_end_lr():
    s = optim.lr_schedule("polynomial", 1.0, total_steps=100, power=2.0)
    assert _eval(s, 0) == pytest.approx(1.0)
    assert _eval(s, 100) == pytest.approx(1e-7, abs=1e-9)


def test_unknown_names_raise():
    with pytest.raises(ValueError):
        optim.lr_schedule("nope", 1.0)
    with pytest.raises(ValueError):
        optim.base_optimizer("sgd", 1.0)


@pytest.mark.parametrize("name,use_8bit", [
    ("adamw", False), ("adamw", True), ("adam", False), ("prodigy", False)])
def test_optimizers_step(name, use_8bit):
    params = {"w": jnp.ones((8, 8)), "b": jnp.zeros((8,))}
    lr = 1.0 if name == "prodigy" else 1e-3
    opt = optim.base_optimizer(name, lr, use_8bit=use_8bit)
    state = opt.init(params)

    def loss(p):
        return jnp.sum((p["w"] @ jnp.ones((8,)) + p["b"]) ** 2)

    for _ in range(3):
        grads = jax.grad(loss)(params)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in params.values())
    assert float(jnp.max(jnp.abs(params["w"] - 1.0))) > 0  # moved


def test_adam8bit_respects_schedule():
    """A zero-LR schedule after step 0 must freeze the 8-bit AdamW."""
    from tokensgen_tpu.train.adam8bit import adamw_8bit

    sched = optax.schedules.linear_schedule(1e-2, 0.0, 2)  # 0 at step>=2
    opt = adamw_8bit(sched, weight_decay=0.0)
    params = {"w": jnp.ones((128, 64))}
    state = opt.init(params)
    g = {"w": jnp.full((128, 64), 0.5)}
    moved, frozen = [], None
    for i in range(4):
        updates, state = opt.update(g, state, params)
        step_norm = float(jnp.max(jnp.abs(updates["w"])))
        moved.append(step_norm)
    assert moved[0] > 0
    assert moved[3] == pytest.approx(0.0, abs=1e-12)  # schedule hit zero
