"""JAX schedulers vs the torch diffusers-0.17.1 oracle (third-party semantics).

Closes the round-2 "same-author oracle" gap (VERDICT item 1): instead of
asserting against hand-derived formulas, these tests execute
tests/thirdparty/diffusers_schedulers.py — a torch reconstruction of the
public diffusers-0.17.1 scheduling files — under the EXACT reference config
(configs/diff_latent_v2.json:48-66, constructed at ldm.py:41-57) and compare:

  * full beta / alpha-cumprod tables,
  * DDPMScheduler.add_noise outputs across a timestep grid,
  * DDIM inference-timestep spacing (leading + steps_offset=1),
  * a COMPLETE 50-step DDIM trajectory (every intermediate latent) through a
    shared closed-form epsilon-net — this is where an off-by-one in timestep
    semantics or a missed clip_sample would show up (it did: round 3 found
    the reference's DDIM clips pred-x0 to [-1,1] via the diffusers default).

The committed golden (tests/goldens/scheduler_diffusers017.npz) is also
re-derived live so neither the golden nor the oracle can drift silently.
"""

import numpy as np
import jax.numpy as jnp
import torch

from amuse_tpu.diffusion import add_noise, ddim_step, ddim_timesteps, make_schedule
from tests.goldens.make_scheduler_golden import (
    ADD_NOISE_TS,
    OUT as GOLDEN_PATH,
    SCHED_KW,
    eps_net_weights,
)
from tests.thirdparty.diffusers_schedulers import DDIMScheduler, DDPMScheduler

GOLD = np.load(GOLDEN_PATH)


def make_oracles():
    ddpm = DDPMScheduler(
        variance_type="fixed_small", clip_sample=False, prediction_type="epsilon",
        **SCHED_KW,
    )
    ddim = DDIMScheduler(set_alpha_to_one=False, steps_offset=1, **SCHED_KW)
    ddim.set_timesteps(50)
    return ddpm, ddim


class TestGoldenIsFresh:
    """The committed npz must equal a live re-run of the torch oracle."""

    def test_tables_match_live_oracle(self):
        ddpm, ddim = make_oracles()
        np.testing.assert_array_equal(GOLD["betas"], ddpm.betas.numpy())
        np.testing.assert_array_equal(GOLD["alphas_cumprod"], ddpm.alphas_cumprod.numpy())
        np.testing.assert_array_equal(GOLD["ddim_timesteps"], ddim.timesteps.numpy())
        np.testing.assert_array_equal(
            GOLD["ddim_final_alpha_cumprod"], ddim.final_alpha_cumprod.numpy()
        )

    def test_add_noise_matches_live_oracle(self):
        ddpm, _ = make_oracles()
        x0 = torch.from_numpy(GOLD["add_noise_x0"])
        noise = torch.from_numpy(GOLD["add_noise_noise"])
        for i, t in enumerate(ADD_NOISE_TS):
            out = ddpm.add_noise(x0, noise, torch.full((x0.shape[0],), int(t)))
            np.testing.assert_array_equal(GOLD["add_noise_out"][i], out.numpy())

    def test_trajectory_matches_live_oracle(self):
        _, ddim = make_oracles()
        w1, freq, w2 = map(torch.from_numpy, eps_net_weights())
        latents = torch.from_numpy(GOLD["x_init"].copy())
        for i, t in enumerate(ddim.timesteps):
            eps = torch.tanh(latents @ w1 + torch.sin(float(t) * freq * 0.01)) @ w2
            latents = ddim.step(eps, int(t), latents, eta=0.0)
            np.testing.assert_array_equal(GOLD["trajectory"][i], latents.numpy())


class TestJaxVsOracle:
    def test_tables(self):
        s = make_schedule(**SCHED_KW)
        # oracle builds tables in float32 (as upstream does); ours go through
        # float64 then cast — agree to fp32 roundoff
        np.testing.assert_allclose(np.asarray(s.betas), GOLD["betas"], rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(s.alphas_cumprod), GOLD["alphas_cumprod"], rtol=3e-6, atol=1e-9
        )

    def test_add_noise(self):
        s = make_schedule(**SCHED_KW)
        x0 = jnp.asarray(GOLD["add_noise_x0"])
        noise = jnp.asarray(GOLD["add_noise_noise"])
        for i, t in enumerate(ADD_NOISE_TS):
            out = add_noise(s, x0, noise, jnp.full((x0.shape[0],), int(t), jnp.int32))
            np.testing.assert_allclose(
                np.asarray(out), GOLD["add_noise_out"][i], rtol=1e-5, atol=1e-6
            )

    def test_ddim_timesteps(self):
        s = make_schedule(**SCHED_KW)
        np.testing.assert_array_equal(
            np.asarray(ddim_timesteps(s, 50, steps_offset=1)), GOLD["ddim_timesteps"]
        )

    def test_full_ddim_trajectory_noclip(self):
        """Every one of the 50 intermediate latents must track the oracle.

        Run without the pred-x0 clamp so the comparison is smooth (clipped
        trajectories are chaotic at the clamp boundary — see below): this
        trajectory pins timestep indexing, alpha gathers, the final-alpha
        fallback and the update formula tightly. An off-by-one diverges at
        the 1e-1..1e0 scale within a few steps.
        """
        s = make_schedule(**SCHED_KW)
        w1, freq, w2 = (jnp.asarray(a) for a in eps_net_weights())
        latents = jnp.asarray(GOLD["x_init"])
        for i, t in enumerate(np.asarray(GOLD["ddim_timesteps"])):
            eps = jnp.tanh(latents @ w1 + jnp.sin(float(t) * freq * 0.01)) @ w2
            latents = ddim_step(
                s, eps, jnp.asarray(int(t)), latents, 50, clip_sample=False
            )
            np.testing.assert_allclose(
                np.asarray(latents),
                GOLD["trajectory_noclip"][i],
                rtol=5e-4,
                atol=5e-4,
                err_msg=f"DDIM diverged from the diffusers oracle at step {i} (t={t})",
            )

    def test_full_ddim_trajectory_clipped(self):
        """The clamped trajectory tracks the oracle except at clamp-boundary
        elements: a pred-x0 landing within fp32 roundoff of +-1 clamps
        differently across frameworks and that single element then drifts.
        The drift from one boundary flip propagates to every dim through the
        eps-net matmuls at the ~1e-4 scale, so the criterion is magnitude-
        based: max deviation < 1e-2 and mean < 5e-4 at every step. A
        missing/wrong clamp blows past both instantly (> 1e-1 — see
        test_clip_matters_for_this_trajectory)."""
        s = make_schedule(**SCHED_KW)
        w1, freq, w2 = (jnp.asarray(a) for a in eps_net_weights())
        latents = jnp.asarray(GOLD["x_init"])
        for i, t in enumerate(np.asarray(GOLD["ddim_timesteps"])):
            eps = jnp.tanh(latents @ w1 + jnp.sin(float(t) * freq * 0.01)) @ w2
            latents = ddim_step(
                s, eps, jnp.asarray(int(t)), latents, 50, clip_sample=True
            )
            diff = np.abs(np.asarray(latents) - GOLD["trajectory"][i])
            assert diff.max() < 1e-2 and diff.mean() < 5e-4, (
                f"step {i} (t={t}): mean {diff.mean():.2e}, max {diff.max():.2e}"
            )

    def test_clip_matters_for_this_trajectory(self):
        """The clamp path is genuinely exercised: without it the run diverges."""
        s = make_schedule(**SCHED_KW)
        w1, freq, w2 = (jnp.asarray(a) for a in eps_net_weights())
        latents = jnp.asarray(GOLD["x_init"])
        for t in np.asarray(GOLD["ddim_timesteps"]):
            eps = jnp.tanh(latents @ w1 + jnp.sin(float(t) * freq * 0.01)) @ w2
            latents = ddim_step(
                s, eps, jnp.asarray(int(t)), latents, 50, clip_sample=False
            )
        assert not np.allclose(
            np.asarray(latents), GOLD["trajectory"][-1], rtol=1e-2, atol=1e-2
        )
