"""Learning-rate schedules and optimizer construction (optax).

Equivalents of `codes/models/optim/__init__.py:38-63` and
`codes/models/optim/lr_schedules.py` as pure step->lr functions:
FixedLR, MultiStepLR and CosineAnnealingRestartLR (BasicSR-style).
The reference steps its schedulers once per iteration, so "epoch" == step.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["define_lr_schedule", "make_adam"]


class ExternalLRTransform(NamedTuple):
    """A GradientTransformation whose updates are UNSCALED (sign-only
    descent direction): the caller must multiply by schedule(global_step).
    The marker lets consumers (tecogan_train_step) verify the pairing —
    applying these updates without the external scale would be effective
    learning rate 1.0 Adam sign-steps."""
    init: Callable
    update: Callable
    external_lr: bool = True


def multistep_lr(base_lr: float, milestones, gamma: float):
    ms = jnp.asarray(sorted(milestones))

    def schedule(step):
        k = jnp.sum(step >= ms)
        return base_lr * gamma ** k

    return schedule


def cosine_annealing_restart_lr(base_lr, periods, restart_weights, eta_min):
    """Cosine annealing with warm restarts; each cycle i spans ``periods[i]``
    steps and restarts scaled by ``restart_weights[i]``."""
    cum = np.cumsum(periods)
    starts = np.concatenate([[0], cum[:-1]])
    cum_j = jnp.asarray(cum)
    starts_j = jnp.asarray(starts)
    periods_j = jnp.asarray(periods, dtype=jnp.float32)
    weights_j = jnp.asarray(restart_weights, dtype=jnp.float32)

    def schedule(step):
        # index of the cycle containing `step` (right-closest, like the ref)
        idx = jnp.sum(step > cum_j)
        idx = jnp.clip(idx, 0, len(periods) - 1)
        frac = (step - starts_j[idx]) / periods_j[idx]
        # past the last cycle the LR parks at eta_min — the reference
        # (BasicSR) raises there; letting cos(pi*frac) wrap would RAISE
        # the LR back toward base_lr mid-training
        frac = jnp.clip(frac, 0.0, 1.0)
        return eta_min + weights_j[idx] * 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * frac))

    return schedule


def define_lr_schedule(schedule_opt, base_lr: float):
    """YAML lr_schedule block -> step->lr callable."""
    if schedule_opt is None or schedule_opt["type"] == "FixedLR":
        return lambda step: jnp.asarray(base_lr, jnp.float32)
    stype = schedule_opt["type"]
    if stype == "MultiStepLR":
        return multistep_lr(
            base_lr, schedule_opt["milestones"], schedule_opt["gamma"])
    if stype == "CosineAnnealingRestartLR":
        return cosine_annealing_restart_lr(
            base_lr,
            schedule_opt["periods"],
            schedule_opt.get("restart_weights", [1.0] * len(
                schedule_opt["periods"])),
            schedule_opt.get("eta_min", 0.0),
        )
    raise ValueError(f"Unrecognized lr schedule: {stype}")


def make_adam(train_opt: dict, external_lr: bool = False):
    """YAML train.{generator|discriminator} block -> (optax tx, schedule).

    torch-Adam semantics: L2 weight decay is added to the gradient before the
    moment updates (not decoupled), eps inside the sqrt denominator.

    ``external_lr=True`` builds the tx WITHOUT the learning-rate scaling
    (just the descent sign); the caller multiplies updates by
    ``schedule(global_step)`` itself. Needed when updates are CONDITIONAL
    (the adaptive discriminator policy): optax's internal schedule count
    advances per APPLIED update, so a count-driven schedule would lag the
    training iteration by every skipped update — the reference steps all
    schedulers once per iteration (`codes/main.py`, lr_schedules).
    """
    base_lr = train_opt["lr"]
    betas = train_opt.get("betas", (0.9, 0.999))
    wd = train_opt.get("weight_decay", 0)
    schedule = define_lr_schedule(train_opt.get("lr_schedule"), base_lr)

    parts = []
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=1e-8))
    if external_lr:
        parts.append(optax.scale(-1.0))
        tx = optax.chain(*parts)
        return ExternalLRTransform(tx.init, tx.update), schedule
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts), schedule
