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

import jax
import jax.numpy as jnp
import optax


def scale_by_adam_lowp(b1: float = 0.9, b2: float = 0.99, eps: float = 1e-8,
                       moment_dtype=jnp.bfloat16
                       ) -> optax.GradientTransformation:
    """scale_by_adam with BOTH moments stored in `moment_dtype`.

    Update math runs in float32 (moments are upcast, blended, downcast), so
    only the at-rest representation loses precision: the four moment
    reads/writes per step drop from 16 to 8 bytes/param — on the headline
    UNet-64 workload that is ~2/3 of the param-sized optimizer traffic
    (PERF.md round-3 roofline, elementwise irreducibles).  optax's own
    `mu_dtype` covers mu only; nu (the variance) dominates neither range nor
    stability here because bf16 keeps float32's 8-bit exponent and the
    denominator enters under a sqrt (~0.2% relative update noise).
    Bias correction matches optax.scale_by_adam exactly.
    """
    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, moment_dtype), params),
            nu=jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, moment_dtype), params))

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - jnp.asarray(b1, jnp.float32) ** count
        c2 = 1.0 - jnp.asarray(b2, jnp.float32) ** count

        def one(m, v, g):
            g = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * jnp.square(g)
            upd = (m32 / c1) / (jnp.sqrt(v32 / c2) + eps)
            return m32.astype(moment_dtype), v32.astype(moment_dtype), upd

        out = jax.tree_util.tree_map(one, state.mu, state.nu, grads)
        mu = jax.tree_util.tree_map(lambda t: t[0], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
        nu = jax.tree_util.tree_map(lambda t: t[1], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
        updates = jax.tree_util.tree_map(
            lambda t: t[2], out, is_leaf=lambda t: isinstance(t, tuple))
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


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
        lowp = getattr(self.args, "opt_moment_dtype", "float32") == "bfloat16"

        def adam_tx():
            kw = dict(b1=p.get("beta1", 0.9), b2=p.get("beta2", 0.99),
                      eps=p.get("epsilon", 1e-8))
            if lowp:
                return scale_by_adam_lowp(moment_dtype=jnp.bfloat16, **kw)
            return optax.scale_by_adam(**kw)

        if self.optimizer == "adam":
            tx = adam_tx()
        elif self.optimizer == "momentum":
            tx = optax.trace(decay=p.get("momentum", 0.9),
                             nesterov=p.get("use_nesterov", False))
        elif self.optimizer == "adamw":
            tx = optax.chain(
                adam_tx(),
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
