"""End-to-end smoke + behaviour tests for both training steps and the
multi-device data-parallel path (tiny model configs, 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from amuse_tpu.core import smplx as smplx_mod
from amuse_tpu.models.denoiser import DenoiserConfig
from amuse_tpu.models.vae import PriorConfig
from amuse_tpu.parallel import make_mesh
from amuse_tpu.train import gesture
from amuse_tpu.train.losses import ast_swap_losses, lpdm_losses, smooth_l1

PRIOR = PriorConfig(nfeats=333, latent_dim=16, ff_size=32, num_layers=3, num_heads=2, window=12)
DEN = DenoiserConfig(latent_dim=16, ff_size=32, num_layers=3, num_heads=2, cond_dim=24)
CFG = gesture.GestureTrainConfig(num_inference_steps=3, vtex_displacement=False)

import functools


@functools.cache
def shared_state():
    return gesture.init_state(jax.random.key(0), PRIOR, DEN, CFG)


@functools.cache
def shared_step(monitor: bool):
    return gesture.make_train_step(PRIOR, DEN, CFG, None, with_monitor=monitor)


def tiny_batch(b=2):
    rng = np.random.default_rng(0)
    return {
        "motion": jnp.asarray(rng.normal(scale=0.1, size=(b, 12, 168)), jnp.float32),
        "con": jnp.asarray(rng.normal(size=(b, 24)), jnp.float32),
        "emo": jnp.asarray(rng.normal(size=(b, 24)), jnp.float32),
        "sty": jnp.asarray(rng.normal(size=(b, 24)), jnp.float32),
        "betas": jnp.zeros((b, 8)),
    }


class TestDropoutStream:
    """The hardware-RNG dropout stream (train/prng.py): dropout masks ride
    XLA's rng-bit-generator (2.3x cheaper than threefry on the TPU VPU -
    the torch-parity attention-weight dropout is ~208M draws/step at
    flagship dims), while semantic draws stay threefry."""

    def test_dropout_key_statistics_and_determinism(self):
        from amuse_tpu.train import prng

        k = prng.dropout_key(jax.random.key(7))
        # usable exactly like a threefry key: split + bernoulli
        a, b = jax.random.split(k)
        mask = jax.random.bernoulli(a, 0.9, (20000,))
        assert 0.88 < float(mask.mean()) < 0.92
        # deterministic per input key, distinct across input keys
        k2 = prng.dropout_key(jax.random.key(7))
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(k)), np.asarray(jax.random.key_data(k2))
        )
        k3 = prng.dropout_key(jax.random.key(8))
        assert not np.array_equal(
            np.asarray(jax.random.key_data(k)), np.asarray(jax.random.key_data(k3))
        )

    def test_train_step_dropout_actually_fires(self):
        """Two different rng keys must give different losses (dropout +
        noise active), and the same key identical losses — under jit, with
        the rbg key derived inside the traced step."""
        state = shared_state()
        step = shared_step(False)
        batch = tiny_batch()
        _, l1 = step(state, batch, jax.random.key(1))
        _, l1b = step(state, batch, jax.random.key(1))
        _, l2 = step(state, batch, jax.random.key(2))
        assert float(l1["total"]) == float(l1b["total"])
        assert float(l1["total"]) != float(l2["total"])


class TestGestureTrainStep:
    def test_loss_decreases_and_params_update(self):
        state = shared_state()
        step = shared_step(False)
        batch = tiny_batch()
        p0 = jax.tree.leaves(state.params)[0].copy()
        losses = []
        for i in range(30):
            state, logs = step(state, batch, jax.random.key(i))
            losses.append(float(logs["recons_feature"] + logs["inst_loss"]))
        assert not np.allclose(np.asarray(jax.tree.leaves(state.params)[0]), np.asarray(p0))
        assert all(np.isfinite(losses))
        # the name says DECREASES: overfitting one fixed batch must drive
        # the differentiable terms down (mean of last 5 vs first 5 to ride
        # out per-step dropout/timestep noise)
        assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
        assert int(state.step) == 30

    def test_monitor_pass_produces_gen_metrics(self):
        state = shared_state()
        smplx_model = smplx_mod.make_test_model()
        cfg = gesture.GestureTrainConfig(num_inference_steps=3, vtex_displacement=True)
        step = gesture.make_train_step(PRIOR, DEN, cfg, smplx_model, with_monitor=True)
        state, logs = step(state, tiny_batch(), jax.random.key(0))
        for k in ["gen_feature", "rec_vtex_displacement", "gen_vtex_displacement"]:
            assert k in logs and np.isfinite(float(logs[k]))

    def test_monitor_terms_carry_no_gradient(self):
        # Total includes monitors, but grads must equal the no-monitor grads.
        state = shared_state()
        batch = tiny_batch()
        s_mon = shared_step(True)
        s_off = shared_step(False)
        st1, _ = s_mon(state, batch, jax.random.key(7))
        st2, _ = s_off(state, batch, jax.random.key(7))
        a = jax.tree.leaves(st1.params)
        b = jax.tree.leaves(st2.params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)

    def test_data_parallel_mesh_matches_single_device(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8
        state = shared_state()
        step = shared_step(False)
        batch = tiny_batch(b=8)

        # single-device result: TWO steps, so the second loss is a function
        # of the FIRST update - corrupted gradient aggregation under the
        # mesh shows up there (a one-step param compare cannot fail: AdamW's
        # first update is bounded by lr, under any sane tolerance)
        st_single, logs_single = step(state, batch, jax.random.key(3))
        st_single, logs_single2 = step(st_single, batch, jax.random.key(4))

        # sharded result
        data_s = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        batch_sh = jax.tree.map(lambda x: jax.device_put(x, data_s), batch)
        state_sh = jax.tree.map(lambda x: jax.device_put(x, repl), state)
        with mesh:
            st_shard, logs_shard = step(state_sh, batch_sh, jax.random.key(3))
            st_shard, logs_shard2 = step(st_shard, batch_sh, jax.random.key(4))
        np.testing.assert_allclose(
            float(logs_single["total"]), float(logs_shard["total"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(logs_single2["total"]), float(logs_shard2["total"]), rtol=1e-3
        )
        # Adam's first step amplifies f32 reduction-order noise up to O(lr):
        # grad/sqrt(v) is sign-like when moments are fresh, so parameters can
        # differ by ~lr=1e-4 while the math is identical. Compare with
        # an lr-scaled budget.
        for x, y in zip(jax.tree.leaves(st_single.params), jax.tree.leaves(st_shard.params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-3, atol=3e-4)


class TestLossFunctions:
    def test_smooth_l1_matches_torch_definition(self):
        x = jnp.asarray([0.0, 0.5, 1.0, 2.0, -3.0])
        y = jnp.zeros(5)
        # elementwise: [0, .125, .5, 1.5, 2.5] -> mean = 0.925
        np.testing.assert_allclose(float(smooth_l1(x, y)), 0.925, rtol=1e-6)

    def test_lpdm_losses_totals(self):
        b = 2
        m = jnp.ones((b, 4, 6))
        total, logs = lpdm_losses(
            m, m, jnp.zeros((b, 1, 3)), jnp.zeros((b, 1, 3)),
            jnp.ones((b, 1, 3)), jnp.ones((b, 1, 3)),
        )
        assert float(total) == 0.0
        assert set(logs) == {"recons_feature", "kl_motion", "inst_loss", "total"}

    def test_ast_swap_losses_shapes(self):
        b = 2
        rng = np.random.default_rng(1)
        recons = jnp.asarray(rng.normal(size=(16, b, 8, 4)), jnp.float32)
        clean = jnp.asarray(rng.normal(size=(4, b, 8, 4)), jnp.float32)
        emo_logits = jnp.asarray(rng.normal(size=(4, b, 8)), jnp.float32)
        sty_logits = jnp.asarray(rng.normal(size=(4, b, 30)), jnp.float32)
        con = jnp.asarray(rng.normal(size=(4, b, 16)), jnp.float32)
        total, logs = ast_swap_losses(
            recons, clean, emo_logits, sty_logits, con,
            jnp.zeros(b, jnp.int32), jnp.ones(b, jnp.int32), jnp.full(b, 2, jnp.int32),
        )
        assert np.isfinite(float(total))
        assert 0 <= float(logs["emo_acc"]) <= 100

    def test_perfect_recon_zero_loss_components(self):
        b = 1
        clean = jnp.ones((4, b, 8, 4))
        recons = jnp.tile(clean, (4, 1, 1, 1))
        # logits strongly peaked at the right labels
        emo_logits = jnp.zeros((4, b, 8)).at[..., 3].set(100.0)
        sty_logits = jnp.zeros((4, b, 30)).at[..., 5].set(100.0)
        con = jnp.ones((4, b, 16))
        total, logs = ast_swap_losses(
            recons, clean, emo_logits, sty_logits, con,
            jnp.full(b, 3, jnp.int32), jnp.full(b, 5, jnp.int32), jnp.full(b, 5, jnp.int32),
        )
        np.testing.assert_allclose(float(total), 0.0, atol=1e-5)
        assert float(logs["emo_acc"]) == 100.0


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (32, 1, 128)

    def test_dryrun_multichip_under_driver_env(self, monkeypatch):
        """Regression for round-1 MULTICHIP failure: the driver calls
        dryrun_multichip directly with JAX_PLATFORMS preset to the tunnelled
        TPU platform; the function must bootstrap its own virtual CPU mesh."""
        import __graft_entry__ as ge

        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        monkeypatch.setenv("XLA_FLAGS", "")
        ge.dryrun_multichip(8)
