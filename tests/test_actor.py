"""ACTOR-style motion AE (reference Actor_transformers.py:42-306)."""

import jax
import jax.numpy as jnp
import numpy as np

from amuse_tpu.models.actor import ActorAE, ActorConfig, ActorDecoder, sinusoidal_positions

CFG = ActorConfig(
    njoints=5, nfeats=6, num_frames=12, num_classes=8,
    latent_dim=16, ff_size=32, num_layers=2, num_heads=2,
)


class TestSinusoid:
    def test_table_values(self):
        pe = sinusoidal_positions(4, 8)
        assert pe.shape == (4, 8)
        np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-7)  # sin(0)
        np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-7)  # cos(0)
        np.testing.assert_allclose(pe[2, 0], np.sin(2.0), atol=1e-6)


class TestActorAE:
    def _batch(self, b=3):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(b, CFG.num_frames, CFG.input_feats)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, CFG.num_classes, size=(b,)), jnp.int32)
        return x, y

    def test_forward_surface(self):
        m = ActorAE(CFG)
        x, y = self._batch()
        out = m.apply(m.init(jax.random.key(0), x, y), x, y)
        assert out["z"].shape == (3, CFG.latent_dim)
        assert out["predicted_labels"].shape == (3, CFG.num_classes)
        # z = mu deterministically (no sampling in the final model)
        assert float(out["recon_loss"]) == 0.0
        np.testing.assert_allclose(
            np.asarray(out["prediction"]).sum(-1), 1.0, atol=1e-5
        )

    def test_class_conditioning_changes_mu(self):
        """The mu query is per-class: same motion, different label -> z differs."""
        m = ActorAE(CFG)
        x, _ = self._batch(1)
        v = m.init(jax.random.key(0), x, jnp.zeros((1,), jnp.int32))
        z0 = m.apply(v, x, jnp.zeros((1,), jnp.int32))["z"]
        z1 = m.apply(v, x, jnp.ones((1,), jnp.int32))["z"]
        assert float(jnp.max(jnp.abs(z0 - z1))) > 1e-4

    def test_class_loss_matches_manual_ce(self):
        m = ActorAE(CFG)
        x, y = self._batch()
        v = m.init(jax.random.key(0), x, y)
        out = m.apply(v, x, y)
        logp = jax.nn.log_softmax(out["predicted_labels"], -1)
        want = -np.mean([logp[i, y[i]] for i in range(3)])
        np.testing.assert_allclose(float(out["class_loss"]), want, rtol=1e-6)

    def test_decoder_shapes_and_grad(self):
        m = ActorDecoder(CFG)
        z = jax.random.normal(jax.random.key(0), (2, CFG.latent_dim))
        v = m.init(jax.random.key(1), z)
        out = m.apply(v, z)
        assert out.shape == (2, CFG.num_frames, CFG.input_feats)

        def loss(p):
            return jnp.mean(m.apply({"params": p}, z) ** 2)

        g = jax.grad(loss)(v["params"])
        assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree.leaves(g))

    def test_registry_tag(self):
        from amuse_tpu.models.registry import get_model

        assert get_model("actor_ae") is ActorAE
