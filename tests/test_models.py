"""Shape/behaviour tests for the model zoo (small configs for CI speed)."""

import jax
import jax.numpy as jnp
import numpy as np

from amuse_tpu.models.ast import ASTConfig, ASTEncoder, ASTDisentangler
from amuse_tpu.models.denoiser import Denoiser, DenoiserConfig
from amuse_tpu.models.vae import MotionPrior, PriorConfig, kl_divergence_normal

SMALL_PRIOR = PriorConfig(nfeats=33, latent_dim=16, ff_size=32, num_layers=3, num_heads=2, window=12)
SMALL_DENOISER = DenoiserConfig(latent_dim=16, ff_size=32, num_layers=3, num_heads=2, cond_dim=24)


class TestMotionPrior:
    def setup_method(self):
        self.model = MotionPrior(SMALL_PRIOR)
        x = jnp.zeros((2, 12, 33))
        self.params = self.model.init(jax.random.key(0), x, jax.random.key(1))["params"]

    def test_shapes(self):
        x = jax.random.normal(jax.random.key(2), (2, 12, 33))
        feats, z, (mu, logvar) = self.model.apply(
            {"params": self.params}, x, jax.random.key(3)
        )
        assert feats.shape == (2, 12, 33)
        assert z.shape == (2, 1, 16)
        assert mu.shape == logvar.shape == (2, 1, 16)

    def test_encode_decode_methods(self):
        x = jax.random.normal(jax.random.key(4), (3, 12, 33))
        z, (mu, logvar) = self.model.apply(
            {"params": self.params}, x, jax.random.key(5), method="encode"
        )
        out = self.model.apply({"params": self.params}, z, 12, method="decode")
        assert out.shape == (3, 12, 33)

    def test_encode_is_deterministic_given_rng(self):
        x = jax.random.normal(jax.random.key(6), (1, 12, 33))
        z1, _ = self.model.apply({"params": self.params}, x, jax.random.key(7), method="encode")
        z2, _ = self.model.apply({"params": self.params}, x, jax.random.key(7), method="encode")
        np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))

    def test_reparam_uses_mu_std(self):
        x = jax.random.normal(jax.random.key(8), (1, 12, 33))
        z, (mu, logvar) = self.model.apply(
            {"params": self.params}, x, jax.random.key(9), method="encode"
        )
        eps = jax.random.normal(jax.random.key(9), mu.shape, mu.dtype)
        expected = mu + jnp.exp(0.5 * logvar) * eps
        np.testing.assert_allclose(np.asarray(z), np.asarray(expected), rtol=1e-6)


class TestDenoiser:
    def test_full_conditioning(self):
        model = Denoiser(SMALL_DENOISER)
        sample = jnp.zeros((2, 1, 16))
        t = jnp.array([10, 500])
        con = emo = sty = jnp.zeros((2, 24))
        params = model.init(jax.random.key(0), sample, t, con, emo, sty)["params"]
        out = model.apply({"params": params}, sample, t, con, emo, sty)
        assert out.shape == (2, 1, 16)

    def test_ablation_without_style(self):
        model = Denoiser(SMALL_DENOISER)
        sample = jnp.zeros((2, 1, 16))
        t = jnp.array([10, 500])
        con = emo = jnp.zeros((2, 24))
        params = model.init(jax.random.key(0), sample, t, con, emo, None)["params"]
        out = model.apply({"params": params}, sample, t, con, emo, None)
        assert out.shape == (2, 1, 16)

    def test_timestep_changes_output(self):
        model = Denoiser(SMALL_DENOISER)
        sample = jnp.ones((1, 1, 16))
        con = jnp.ones((1, 24))
        params = model.init(jax.random.key(0), sample, jnp.array([0]), con)["params"]
        o1 = model.apply({"params": params}, sample, jnp.array([0]), con)
        o2 = model.apply({"params": params}, sample, jnp.array([999]), con)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


class TestKL:
    def test_standard_normal_is_zero(self):
        mu = jnp.zeros((4, 1, 8))
        logvar = jnp.zeros((4, 1, 8))
        assert float(kl_divergence_normal(mu, logvar)) == 0.0

    def test_matches_closed_form(self):
        mu = jnp.full((1, 1, 1), 2.0)
        logvar = jnp.full((1, 1, 1), jnp.log(4.0))
        # 0.5*(mu^2 + var - 1 - log var) = 0.5*(4 + 4 - 1 - log4)
        expected = 0.5 * (4 + 4 - 1 - np.log(4.0))
        np.testing.assert_allclose(float(kl_divergence_normal(mu, logvar)), expected, rtol=1e-6)


class TestAST:
    def test_tiny_encoder_shapes(self):
        cfg = ASTConfig(
            input_tdim=64, input_fdim=32, embed_dim=24, depth=2, num_heads=2, label_dim=8
        )
        model = ASTEncoder(cfg)
        spec = jnp.zeros((2, 64, 32))
        params = model.init(jax.random.key(0), spec)["params"]
        out = model.apply({"params": params}, spec)
        assert out["feature"].shape == (2, 256)
        assert out["logits"].shape == (2, 8)
        assert cfg.num_patches == ((32 - 16) // 10 + 1) * ((64 - 16) // 10 + 1)

    def test_flagship_patch_grid(self):
        cfg = ASTConfig()
        assert cfg.f_patches == 12
        assert cfg.t_patches == 101
        assert cfg.num_patches == 1212
