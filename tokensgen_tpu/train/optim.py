"""Optimizer + LR-schedule factory.

Mirrors the reference trainers' surface: ``get_optimizer``
(`train_cogvideo_to2v.py:1056-1136` — adam / adamw / prodigy, with
``use_8bit_adam`` picking the 8-bit moment variants for adam/adamw) and the
diffusers ``get_scheduler`` names (`train_cogvideo_to2v.py:47,333,1558` —
constant, constant_with_warmup, linear, cosine, cosine_with_restarts,
polynomial). The shipped configs use adamw-8bit + constant/0-warmup; the
other names exist because the reference CLI exposes them.
"""

from __future__ import annotations

from typing import Optional, Union

import optax

Schedule = Union[float, optax.Schedule]

_NAMES = ("constant", "constant_with_warmup", "linear", "cosine",
          "cosine_with_restarts", "polynomial")


def lr_schedule(
    name: str,
    learning_rate: float,
    warmup_steps: int = 0,
    total_steps: int = 1000,
    num_cycles: int = 1,
    power: float = 1.0,
    lr_end: float = 1e-7,
) -> Schedule:
    """diffusers-`get_scheduler`-style LR curve as an optax schedule.

    ``total_steps`` counts optimizer updates (post-accumulation), matching the
    reference's ``max_train_steps``; decay spans ``total_steps - warmup_steps``.
    """
    name = (name or "constant").lower()
    if name not in _NAMES:
        raise ValueError(f"unknown lr_scheduler {name!r}; expected {_NAMES}")
    if name == "constant" and warmup_steps <= 0:
        return learning_rate
    decay_steps = max(1, total_steps - warmup_steps)
    if name in ("constant", "constant_with_warmup"):
        body = optax.schedules.constant_schedule(learning_rate)
    elif name == "linear":
        body = optax.schedules.linear_schedule(learning_rate, 0.0, decay_steps)
    elif name == "cosine":
        body = optax.schedules.cosine_decay_schedule(learning_rate, decay_steps)
    elif name == "cosine_with_restarts":
        n = max(1, int(num_cycles))
        per = max(1, decay_steps // n)
        body = optax.schedules.join_schedules(
            [optax.schedules.cosine_decay_schedule(learning_rate, per)] * n,
            boundaries=[per * i for i in range(1, n)])
    else:  # polynomial
        body = optax.schedules.polynomial_schedule(
            learning_rate, lr_end, power, decay_steps)
    if warmup_steps <= 0:
        return body
    warm = optax.schedules.linear_schedule(0.0, learning_rate, warmup_steps)
    return optax.schedules.join_schedules([warm, body], [warmup_steps])


def base_optimizer(
    name: str,
    learning_rate: Schedule,
    b1: float = 0.9,
    b2: float = 0.95,
    eps: float = 1e-8,
    weight_decay: float = 1e-4,
    use_8bit: bool = False,
    prodigy_beta3: Optional[float] = None,
    prodigy_safeguard_warmup: bool = False,
) -> optax.GradientTransformation:
    """adam | adamw | prodigy; ``use_8bit`` selects the int8-moment AdamW
    (ignored for prodigy, as in the reference)."""
    name = (name or "adamw").lower()
    if name == "prodigy":
        return optax.contrib.prodigy(
            learning_rate, betas=(b1, b2), beta3=prodigy_beta3, eps=eps,
            weight_decay=weight_decay,
            safeguard_warmup=prodigy_safeguard_warmup)
    if name not in ("adam", "adamw"):
        raise ValueError(f"unknown optimizer {name!r}; expected adam|adamw|prodigy")
    if use_8bit:
        from tokensgen_tpu.train.adam8bit import adamw_8bit

        # the reference's Adam8bit/AdamW8bit both apply decoupled decay via
        # bnb; one int8 implementation serves both names here
        return adamw_8bit(learning_rate, b1=b1, b2=b2, eps=eps,
                          weight_decay=weight_decay)
    if name == "adam":
        # torch.optim.Adam semantics: L2 penalty folded into the gradient
        return optax.chain(optax.add_decayed_weights(weight_decay),
                           optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
                           optax.scale_by_learning_rate(learning_rate))
    return optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                       weight_decay=weight_decay)
