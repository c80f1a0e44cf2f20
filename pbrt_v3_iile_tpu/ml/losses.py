"""Training losses: L1 / relative-L1 / relative-MSE.

Parity with the reference's loss modules (ref: ml/iispt_loss.py:19-82 —
L1Loss, RelL1Loss, RelMSELoss).  The relative variants normalize the
per-pixel error by the target magnitude (plus eps) so bright pixels do
not dominate; the reference trainer uses plain L1 by default
(ref: ml/main_train.py:23).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-2  # (ref: iispt_loss.py denominator stabilizer)


def l1(out, target):
    return jnp.mean(jnp.abs(out - target))


def rel_l1(out, target, eps: float = EPS):
    return jnp.mean(jnp.abs(out - target) / (jnp.abs(target) + eps))


def rel_mse(out, target, eps: float = EPS):
    d = out - target
    return jnp.mean(d * d / (target * target + eps))


LOSSES = {"l1": l1, "rel_l1": rel_l1, "rel_mse": rel_mse}


def get(name: str):
    return LOSSES[name]
