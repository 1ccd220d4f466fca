"""Raw-pose diffusion baseline training smoke test."""

import jax
import jax.numpy as jnp
import numpy as np

from amuse_tpu.models.raw_diffusion import RawDenoiserConfig
from amuse_tpu.train import raw_diffusion as rd

CFG_M = RawDenoiserConfig(nfeats=12, latent_dim=16, ff_size=32, num_layers=2, num_heads=2, cond_dim=8, window=6)
CFG_T = rd.RawTrainConfig(num_timesteps=50)


def test_train_step_and_sampling():
    state = rd.init_state(jax.random.key(0), CFG_M, CFG_T)
    step, sample_fn = rd.make_train_step(CFG_M, CFG_T)
    rng = np.random.default_rng(0)
    batch = {
        "motion": jnp.asarray(rng.normal(scale=0.2, size=(4, 6, 12)), jnp.float32),
        "con": jnp.asarray(rng.normal(size=(4, 8)), jnp.float32),
        "emo": jnp.asarray(rng.normal(size=(4, 8)), jnp.float32),
    }
    p0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    for i in range(3):
        state, logs = step(state, batch, jax.random.key(i))
    assert np.isfinite(float(logs["loss"]))
    assert not np.allclose(np.asarray(jax.tree.leaves(state.params)[0]), p0)
    # sampler-state accumulated losses
    assert int(jnp.sum(state.sampler_state.counts)) == 12  # 3 steps x batch 4

    out = sample_fn(state.params, jax.random.key(9), {"con": batch["con"], "emo": batch["emo"]})
    assert out.shape == (4, 6, 12)
    assert bool(jnp.all(jnp.isfinite(out)))
