"""Generate scheduler goldens from the torch diffusers-0.17.1 oracle.

Runs tests/thirdparty/diffusers_schedulers.py (torch) with the EXACT reference
scheduler config (configs/diff_latent_v2.json:48-66: 1000 train steps,
scaled_linear 0.00085->0.012, epsilon prediction, clip_sample=False,
set_alpha_to_one=False, steps_offset=1, 50 DDIM steps, eta=0) and commits:

  * the full beta / alpha-cumprod tables,
  * ``add_noise`` outputs on a fixed grid of timesteps,
  * the DDIM inference-timestep array,
  * a COMPLETE 50-step DDIM trajectory (every intermediate latent) from
    fixed initial latents through a fixed closed-form epsilon-net,
  * the epsilon-net weights, so the JAX side can reproduce the same net.

Usage:  python tests/goldens/make_scheduler_golden.py
Output: tests/goldens/scheduler_diffusers017.npz
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np
import torch

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from thirdparty.diffusers_schedulers import DDIMScheduler, DDPMScheduler  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parent / "scheduler_diffusers017.npz"

# the reference's diff_latent_v2.json scheduler blocks
SCHED_KW = dict(
    num_train_timesteps=1000,
    beta_start=0.00085,
    beta_end=0.012,
    beta_schedule="scaled_linear",
)
ADD_NOISE_TS = np.array([0, 1, 20, 250, 500, 747, 998, 999], dtype=np.int64)
B, L, D, H = 4, 1, 128, 64


def eps_net_weights():
    rs = np.random.RandomState(20260817)
    w1 = (rs.randn(D, H) * 0.2).astype(np.float32)
    freq = rs.randn(H).astype(np.float32)
    w2 = (rs.randn(H, D) * 0.2).astype(np.float32)
    return w1, freq, w2


def main() -> None:
    ddpm = DDPMScheduler(
        variance_type="fixed_small",
        clip_sample=False,
        prediction_type="epsilon",
        **SCHED_KW,
    )
    ddim = DDIMScheduler(set_alpha_to_one=False, steps_offset=1, clip_sample=True, **SCHED_KW)
    # NOTE clip_sample: diffusers' DDIMScheduler default is True and the
    # reference does not override it for the DDIM (inference) scheduler —
    # only the DDPM (noising) one gets clip_sample=False from the config.
    ddim.set_timesteps(50)

    g = torch.Generator().manual_seed(7)
    x0 = torch.randn(B, L, D, generator=g)
    noise = torch.randn(B, L, D, generator=g)
    add_noise_out = np.stack(
        [
            ddpm.add_noise(x0, noise, torch.full((B,), int(t), dtype=torch.long)).numpy()
            for t in ADD_NOISE_TS
        ]
    )

    w1, freq, w2 = eps_net_weights()
    tw1, tfreq, tw2 = map(torch.from_numpy, (w1, freq, w2))

    def eps_net(x: torch.Tensor, t: int) -> torch.Tensor:
        h = torch.tanh(x @ tw1 + torch.sin(float(t) * tfreq * 0.01))
        return h @ tw2

    latents0 = torch.randn(B, L, D, generator=g) * ddim.init_noise_sigma
    x_init = latents0.numpy().copy()
    traj = []
    latents = latents0.clone()
    for t in ddim.timesteps:
        eps = eps_net(latents, int(t))
        latents = ddim.step(eps, int(t), latents, eta=0.0)
        traj.append(latents.numpy().copy())

    # a second, clip-free trajectory: clipped runs are chaotic at the clamp
    # boundary (a pred-x0 landing within fp32 roundoff of +-1 clamps
    # differently across frameworks), so the tight cross-framework comparison
    # runs without the clamp while the clamped golden pins its semantics
    ddim_noclip = DDIMScheduler(
        set_alpha_to_one=False, steps_offset=1, clip_sample=False, **SCHED_KW
    )
    ddim_noclip.set_timesteps(50)
    traj_noclip = []
    latents = latents0.clone()
    for t in ddim_noclip.timesteps:
        eps = eps_net(latents, int(t))
        latents = ddim_noclip.step(eps, int(t), latents, eta=0.0)
        traj_noclip.append(latents.numpy().copy())

    np.savez_compressed(
        OUT,
        betas=ddpm.betas.numpy(),
        alphas_cumprod=ddpm.alphas_cumprod.numpy(),
        ddim_final_alpha_cumprod=ddim.final_alpha_cumprod.numpy(),
        ddim_timesteps=ddim.timesteps.numpy(),
        add_noise_ts=ADD_NOISE_TS,
        add_noise_x0=x0.numpy(),
        add_noise_noise=noise.numpy(),
        add_noise_out=add_noise_out,
        eps_w1=w1,
        eps_freq=freq,
        eps_w2=w2,
        x_init=x_init,
        trajectory=np.stack(traj),
        trajectory_noclip=np.stack(traj_noclip),
    )
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
