"""One-pass fused Adam/AdamW update (TPU HBM-bandwidth optimization).

Motivation (docs/PARITY.md stage-1 roofline): the optimizer update over the
424.7M-param stage-1 tree measured 34.6 ms standalone vs a ~14.5 ms
pure-HBM floor (7 passes x 1.7 GB at 819 GB/s). The optax chain used by the
train steps (``add_decayed_weights -> scale_by_adam -> scale(-lr)`` then
``optax.apply_updates``) materializes an intermediate *updates* tree between
each transform, so the same activations cross HBM several extra times.

This module computes ``(p', mu', nu')`` per leaf in ONE expression, letting
XLA emit a single multi-output elementwise fusion per leaf that reads each
of p/g/mu/nu exactly once and writes p'/mu'/nu' exactly once - the minimal
7-pass traffic. No Pallas needed: this is XLA's bread-and-butter fusion
shape; the win is *not creating the intermediate trees in the first place*.

Numerical semantics are pinned by tests/test_fused_adam.py against BOTH the
optax chains they replace and live ``torch.optim.Adam/AdamW`` executions
(third-party oracle), matching the reference trainers:

  * mode="l2": torch ``Adam(weight_decay=wd)`` - wd*p added to the RAW
    gradient BEFORE the moment updates (reference scripts/trainer.py:126-132
    stage-1 optimizer; optax equivalent: add_decayed_weights BEFORE
    scale_by_adam, see train/audio.py::make_optimizer).
  * mode="decoupled": torch ``AdamW`` / ``optax.adamw`` - weight decay
    applied outside the moments (reference scripts/trainer.py:180-184
    stage-2 joint optimizer, wd=0.01 torch default).

The learning rate lives in the state (``FusedAdamState.lr``) so epoch
schedules mutate it exactly like the ``inject_hyperparams`` pattern it
replaces (train/audio.py::set_lr).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class FusedAdamState(NamedTuple):
    """Pytree optimizer state (orbax-checkpointable like optax's)."""

    count: jax.Array  # () int32, number of updates applied so far
    lr: jax.Array  # () f32, current learning rate (mutable via _replace)
    mu: Any  # first-moment tree, like params
    nu: Any  # second-moment tree, like params


class FusedAdam(NamedTuple):
    """init/apply pair. ``apply`` REPLACES the optax two-call pattern
    (``optimizer.update`` + ``optax.apply_updates``): it returns the new
    params directly so the whole update is one fused pass."""

    init: Any  # (params, lr) -> FusedAdamState
    apply: Any  # (state, params, grads) -> (new_params, new_state)


def make_fused_adam(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    mode: str = "decoupled",
) -> FusedAdam:
    if mode not in ("l2", "decoupled"):
        raise ValueError(f"mode must be 'l2' or 'decoupled', got {mode!r}")

    def init(params, lr: float) -> FusedAdamState:
        zeros = jax.tree.map(jnp.zeros_like, params)
        return FusedAdamState(
            count=jnp.zeros((), jnp.int32),
            lr=jnp.asarray(lr, jnp.float32),
            mu=zeros,
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def apply(state: FusedAdamState, params, grads):
        count = state.count + 1
        # scalar prefactors: computed once, broadcast into every leaf fusion
        t = count.astype(jnp.float32)
        c1 = 1.0 - jnp.power(jnp.float32(b1), t)  # bias corrections
        c2 = 1.0 - jnp.power(jnp.float32(b2), t)
        lr = state.lr

        def leaf(p, g, mu, nu):
            g = g.astype(jnp.float32)
            if mode == "l2" and weight_decay:
                g = g + weight_decay * p
            mu2 = b1 * mu + (1.0 - b1) * g
            nu2 = b2 * nu + (1.0 - b2) * (g * g)
            upd = (mu2 / c1) / (jnp.sqrt(nu2 / c2) + eps)
            if mode == "decoupled" and weight_decay:
                upd = upd + weight_decay * p
            return p - lr * upd, mu2, nu2

        p_flat, treedef = jax.tree.flatten(params)
        g_flat = treedef.flatten_up_to(grads)
        mu_flat = treedef.flatten_up_to(state.mu)
        nu_flat = treedef.flatten_up_to(state.nu)
        out = [leaf(*xs) for xs in zip(p_flat, g_flat, mu_flat, nu_flat)]
        unflat = lambda i: jax.tree.unflatten(treedef, [o[i] for o in out])  # noqa: E731
        return unflat(0), FusedAdamState(count, lr, unflat(1), unflat(2))

    return FusedAdam(init=init, apply=apply)
