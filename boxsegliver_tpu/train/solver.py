"""Optimizer + learning-rate policy factory (reference core/solver.py:112-254).

LR policies (reference _get_model_learning_rate, solver.py:138-200):
- period_step: staircase exponential decay  lr * rate^(step // decay_step)
- custom_step: piecewise-constant at boundaries
- poly:        polynomial decay to lr_end over num_of_total_steps
- plateau:     lr = base * lr_scale, where lr_scale lives in the train state
               and is decayed by the host-side ReduceLROnPlateau controller
               (reference plateau_decay solver.py:246-254 + hooks.py:581-723)
- slow start:  lr = slow_start_lr while step < slow_start_step
               (solver.py:198-200)

Optimizers (reference _get_model_optimizer, solver.py:204-218): Adam
(beta1 0.9, beta2 0.99), Momentum (0.9), AdamW (decoupled weight decay).
Implemented as optax gradient transforms WITHOUT a baked-in schedule: the
train step computes lr(step) * lr_scale on device and scales the updates, so
one compiled executable serves all policies including runtime plateau decay.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import optax


def make_lr_fn(args) -> Callable:
    """Returns lr(step, lr_scale) -> float32 scalar (jit-friendly)."""
    policy = args.learning_policy
    base = float(args.learning_rate)

    if policy == "period_step":
        def schedule(step):
            return base * jnp.power(args.lr_decay_rate,
                                    jnp.floor(step / args.lr_decay_step))
    elif policy == "custom_step":
        boundaries = list(args.lr_decay_boundaries or [])
        values = list(args.lr_custom_values or [base])
        if len(values) != len(boundaries) + 1:
            raise ValueError("len(lr_custom_values) - len(lr_decay_boundaries) != 1")

        def schedule(step):
            lr = jnp.asarray(values[0], jnp.float32)
            for b, v in zip(boundaries, values[1:]):
                lr = jnp.where(step >= b, v, lr)
            return lr
    elif policy == "poly":
        total = float(args.num_of_total_steps)
        power = float(args.lr_power)
        end = float(args.lr_end)

        def schedule(step):
            frac = jnp.clip(step.astype(jnp.float32) / total, 0.0, 1.0)
            return (base - end) * jnp.power(1.0 - frac, power) + end
    elif policy == "plateau":
        end = float(args.lr_end)

        def schedule(step):
            return jnp.asarray(base, jnp.float32)
    else:
        raise ValueError("Not supported learning policy: " + policy)

    slow_start = bool(getattr(args, "lr_warm_up", False))
    ss_step = int(getattr(args, "slow_start_step", 0))
    ss_lr = float(getattr(args, "slow_start_lr", 1e-4))

    def lr_fn(step, lr_scale=1.0):
        step = jnp.asarray(step)
        lr = schedule(step)
        if policy == "plateau":
            lr = jnp.maximum(lr * lr_scale, float(args.lr_end))
        if slow_start and ss_step > 0:
            lr = jnp.where(step < ss_step, ss_lr, lr)
        return lr

    return lr_fn


class Solver:
    """Optimizer factory + LR policy holder (reference core/solver.py:109-243)."""

    def __init__(self, args, optimizer_params: Optional[dict] = None):
        self.args = args
        self.optimizer = args.optimizer.lower()
        self.optimizer_params = optimizer_params or {}
        self.lr_fn = make_lr_fn(args)

    def make_transform(self) -> optax.GradientTransformation:
        """Returns a transform producing DESCENT updates at unit LR; the train
        step multiplies by lr(step) (so plateau decay needs no recompile)."""
        p = self.optimizer_params
        if self.optimizer == "adam":
            tx = optax.scale_by_adam(b1=p.get("beta1", 0.9), b2=p.get("beta2", 0.99),
                                     eps=p.get("epsilon", 1e-8))
        elif self.optimizer == "momentum":
            tx = optax.trace(decay=p.get("momentum", 0.9),
                             nesterov=p.get("use_nesterov", False))
        elif self.optimizer == "adamw":
            tx = optax.chain(
                optax.scale_by_adam(b1=p.get("beta1", 0.9), b2=p.get("beta2", 0.99),
                                    eps=p.get("epsilon", 1e-8)),
                optax.add_decayed_weights(
                    p.get("weight_decay", self.args.weight_decay_rate)),
            )
        else:
            raise ValueError("Not supported optimizer: " + self.optimizer)
        return optax.chain(tx, optax.scale(-1.0))


def get_solver_params(args) -> dict:
    """Optimizer kwargs from flags (reference get_solver_params solver.py:85-108)."""
    p = {}
    if getattr(args, "adam_beta1", None):
        p["beta1"] = args.adam_beta1
    if getattr(args, "adam_beta2", None):
        p["beta2"] = args.adam_beta2
    if getattr(args, "adam_eps", None):
        p["epsilon"] = args.adam_eps
    if getattr(args, "mm_mm", None):
        p["momentum"] = args.mm_mm
    if getattr(args, "mm_nesterov", False):
        p["use_nesterov"] = True
    return {"solver": Solver(args, optimizer_params=p or None), "solver_kwargs": {}}
