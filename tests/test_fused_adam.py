"""Parity tests for the one-pass fused Adam/AdamW (train/fused_adam.py).

Pinned against BOTH:
  * the optax chains the train steps used previously (exact drop-in check),
  * live ``torch.optim.Adam`` / ``torch.optim.AdamW`` executions - the
    third-party oracle for the reference's actual optimizers
    (scripts/trainer.py:126-132 stage-1 Adam w/ L2 wd; :180-184 stage-2
    AdamW torch-default wd).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from amuse_tpu.train.fused_adam import make_fused_adam


def _tree(rng, scale=1.0):
    return {
        "w": jnp.asarray(rng.normal(scale=scale, size=(17, 23)), jnp.float32),
        "b": jnp.asarray(rng.normal(scale=scale, size=(23,)), jnp.float32),
        "nest": {"k": jnp.asarray(rng.normal(scale=scale, size=(5, 3, 4)), jnp.float32)},
    }


def _grads(rng, like):
    return jax.tree.map(
        lambda x: jnp.asarray(rng.normal(size=x.shape), jnp.float32), like
    )


class TestVsOptax:
    def test_l2_mode_matches_audio_chain_with_lr_change(self):
        """mode='l2' == add_decayed_weights -> scale_by_adam -> scale(-lr),
        including an epoch-style lr change after step 3 (the inject_
        hyperparams mutation pattern in train/audio.py::set_lr)."""
        b1, b2, wd = 0.95, 0.999, 5e-7
        rng = np.random.default_rng(0)
        params = _tree(rng)

        chain = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(wd),
                optax.scale_by_adam(b1=b1, b2=b2),
                optax.scale(-learning_rate),
            )
        )(learning_rate=1e-5)
        ostate = chain.init(params)
        fused = make_fused_adam(b1=b1, b2=b2, weight_decay=wd, mode="l2")
        fstate = fused.init(params, 1e-5)

        p_opt, p_fused = params, params
        for step in range(6):
            if step == 3:  # MultiStepLR-style decay
                ostate.hyperparams["learning_rate"] = jnp.asarray(1e-5 * 0.85)
                fstate = fstate._replace(lr=jnp.asarray(1e-5 * 0.85))
            g = _grads(np.random.default_rng(100 + step), params)
            upd, ostate = chain.update(g, ostate, p_opt)
            p_opt = optax.apply_updates(p_opt, upd)
            p_fused, fstate = fused.apply(fstate, p_fused, g)

        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            ),
            p_opt,
            p_fused,
        )

    def test_decoupled_mode_matches_optax_adamw(self):
        lr, wd = 1e-4, 0.01
        rng = np.random.default_rng(1)
        params = _tree(rng)
        chain = optax.adamw(lr, weight_decay=wd)
        ostate = chain.init(params)
        fused = make_fused_adam(weight_decay=wd, mode="decoupled")
        fstate = fused.init(params, lr)

        p_opt, p_fused = params, params
        for step in range(5):
            g = _grads(np.random.default_rng(200 + step), params)
            upd, ostate = chain.update(g, ostate, p_opt)
            p_opt = optax.apply_updates(p_opt, upd)
            p_fused, fstate = fused.apply(fstate, p_fused, g)

        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            ),
            p_opt,
            p_fused,
        )


class TestVsTorch:
    """Live torch executions: the reference's real optimizer stepped on the
    same numbers."""

    def _run_both(self, torch_opt_cls, torch_kwargs, fused, lr, steps=5):
        rng = np.random.default_rng(7)
        w0 = rng.normal(size=(11, 13)).astype(np.float32)
        b0 = rng.normal(size=(13,)).astype(np.float32)
        gs = [
            (
                rng.normal(size=(11, 13)).astype(np.float32),
                rng.normal(size=(13,)).astype(np.float32),
            )
            for _ in range(steps)
        ]

        tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
        opt = torch_opt_cls([tw, tb], lr=lr, **torch_kwargs)
        for gw, gb in gs:
            opt.zero_grad()
            tw.grad = torch.from_numpy(gw.copy())
            tb.grad = torch.from_numpy(gb.copy())
            opt.step()

        params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
        fstate = fused.init(params, lr)
        for gw, gb in gs:
            params, fstate = fused.apply(
                fstate, params, {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}
            )
        np.testing.assert_allclose(
            np.asarray(params["w"]), tw.detach().numpy(), rtol=2e-5, atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(params["b"]), tb.detach().numpy(), rtol=2e-5, atol=2e-6
        )

    def test_l2_mode_matches_torch_adam(self):
        """torch Adam(weight_decay=5e-7, betas=(0.95, 0.999)) - the stage-1
        reference optimizer."""
        self._run_both(
            torch.optim.Adam,
            dict(betas=(0.95, 0.999), weight_decay=5e-7),
            make_fused_adam(b1=0.95, b2=0.999, weight_decay=5e-7, mode="l2"),
            lr=1e-2,  # large lr so wd actually moves digits
        )

    def test_decoupled_mode_matches_torch_adamw(self):
        """torch AdamW(weight_decay=0.01) - the stage-2 joint optimizer."""
        self._run_both(
            torch.optim.AdamW,
            dict(weight_decay=0.01),
            make_fused_adam(weight_decay=0.01, mode="decoupled"),
            lr=1e-2,
        )


def test_bad_mode_rejected():
    with pytest.raises(ValueError):
        make_fused_adam(mode="nope")
