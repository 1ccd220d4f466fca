"""Parity tests for the DDPM/DDIM schedulers against hand-derived
diffusers-0.17 math (configs/diff_latent_v2.json:48-66 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from amuse_tpu.diffusion import (
    add_noise,
    ddim_sample,
    ddim_step,
    ddim_timesteps,
    make_schedule,
)


def ref_tables():
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    return betas, np.cumprod(1 - betas)


class TestSchedule:
    def test_beta_endpoints(self):
        s = make_schedule()
        assert np.isclose(float(s.betas[0]), 0.00085)
        assert np.isclose(float(s.betas[-1]), 0.012)
        betas, acp = ref_tables()
        np.testing.assert_allclose(np.asarray(s.betas), betas, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s.alphas_cumprod), acp, rtol=1e-5)

    def test_add_noise_formula(self):
        s = make_schedule()
        _, acp = ref_tables()
        x0 = jnp.ones((2, 1, 4))
        noise = jnp.full((2, 1, 4), 2.0)
        t = jnp.array([0, 999])
        out = np.asarray(add_noise(s, x0, noise, t))
        for i, ti in enumerate([0, 999]):
            expected = np.sqrt(acp[ti]) * 1.0 + np.sqrt(1 - acp[ti]) * 2.0
            np.testing.assert_allclose(out[i], expected, rtol=1e-5)

    def test_ddim_timestep_spacing(self):
        s = make_schedule()
        ts = np.asarray(ddim_timesteps(s, 50, steps_offset=1))
        # diffusers leading spacing: round(i * 20)[::-1] + 1
        expected = (np.arange(50) * 20)[::-1] + 1
        np.testing.assert_array_equal(ts, expected)
        assert ts[0] == 981 and ts[-1] == 1

    def test_ddim_step_matches_closed_form(self):
        # clip_sample defaults to True: the reference's DDIMScheduler is
        # built without overriding diffusers' clip_sample=True default, so
        # pred-x0 is clamped into [-1, 1] before the update.
        s = make_schedule()
        _, acp = ref_tables()
        x = jnp.full((1, 1, 4), 0.7)
        eps = jnp.full((1, 1, 4), -0.3)
        t = 981
        out = np.asarray(ddim_step(s, eps, jnp.asarray(t), x, 50))
        a_t, a_prev = acp[t], acp[t - 20]
        x0 = (0.7 - np.sqrt(1 - a_t) * (-0.3)) / np.sqrt(a_t)
        assert x0 > 1.0  # the clamp must actually engage at this t
        expected = np.sqrt(a_prev) * np.clip(x0, -1, 1) + np.sqrt(1 - a_prev) * (-0.3)
        np.testing.assert_allclose(out, expected, rtol=1e-5)

        out_noclip = np.asarray(
            ddim_step(s, eps, jnp.asarray(t), x, 50, clip_sample=False)
        )
        expected_noclip = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * (-0.3)
        np.testing.assert_allclose(out_noclip, expected_noclip, rtol=1e-5)
        assert not np.allclose(out, out_noclip)

    def test_ddim_final_step_uses_alpha0(self):
        # set_alpha_to_one=False: at t=1 the "previous" alpha is acp[0].
        s = make_schedule()
        _, acp = ref_tables()
        x = jnp.full((1, 1, 2), 0.5)
        eps = jnp.full((1, 1, 2), 0.1)
        out = np.asarray(ddim_step(s, eps, jnp.asarray(1), x, 50))
        a_t, a_prev = acp[1], acp[0]
        x0 = (0.5 - np.sqrt(1 - a_t) * 0.1) / np.sqrt(a_t)
        expected = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * 0.1
        np.testing.assert_allclose(out, expected, rtol=1e-5)


class TestSampler:
    def test_identity_denoiser_telescopes(self):
        # With eps(x, t) = x / sqrt(1 - acp_t) (i.e. x0 == 0) each DDIM step
        # scales x by sqrt(1 - acp_prev)/sqrt(1 - acp_t); the 50-step product
        # telescopes to sqrt(1 - acp[0]) / sqrt(1 - acp[981]) since the final
        # step uses acp[0] (set_alpha_to_one=False).
        s = make_schedule()

        def denoise_fn(latents, t):
            return latents / jnp.sqrt(1.0 - s.alphas_cumprod[t])

        rng = jax.random.key(0)
        out = ddim_sample(s, denoise_fn, rng, (4, 1, 8))
        x0 = jax.random.normal(rng, (4, 1, 8), jnp.float32)
        _, acp = ref_tables()
        factor = np.sqrt(1 - acp[0]) / np.sqrt(1 - acp[981])
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0) * factor, rtol=1e-3, atol=1e-5)

    def test_scan_matches_python_loop(self):
        s = make_schedule()

        def denoise_fn(latents, t):
            # arbitrary but deterministic nonlinear model
            return jnp.tanh(latents) * (1.0 + t.astype(jnp.float32) / 1000.0)

        rng = jax.random.key(1)
        scanned = np.asarray(ddim_sample(s, denoise_fn, rng, (2, 1, 4)))

        latents = jax.random.normal(rng, (2, 1, 4), jnp.float32)
        for t in np.asarray(ddim_timesteps(s, 50)):
            eps = denoise_fn(latents, jnp.asarray(t))
            latents = ddim_step(s, eps, jnp.asarray(t), latents, 50)
        np.testing.assert_allclose(scanned, np.asarray(latents), rtol=1e-5, atol=1e-6)

    def test_sampler_jits(self):
        s = make_schedule()
        f = jax.jit(
            lambda rng: ddim_sample(s, lambda x, t: 0.1 * x, rng, (2, 1, 128))
        )
        out = f(jax.random.key(2))
        assert out.shape == (2, 1, 128)
        assert bool(jnp.all(jnp.isfinite(out)))
