"""External FGD embedder (eval/embedder.py): training, (de)serialisation,
and the fgd_embedder report path through the eval runner."""

import jax
import jax.numpy as jnp
import numpy as np

from amuse_tpu.eval import embedder as emb
from amuse_tpu.eval.runner import evaluate_cache
from amuse_tpu.infer.pipeline import GesturePipeline, init_random_params
from amuse_tpu.models.ast import ASTConfig
from amuse_tpu.models.denoiser import DenoiserConfig
from amuse_tpu.models.vae import PriorConfig

from tests.test_eval_runner import FakeCache

CFG = emb.EmbedderConfig(in_dim=333, window=30, channels=(16, 8), latent_dim=8)


def test_embed_shape_and_determinism():
    params = emb.init_params(jax.random.key(0), CFG)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 30, 333)), jnp.float32)
    z1 = emb.embed(params, CFG, x)
    z2 = emb.embed(params, CFG, x)
    assert z1.shape == (4, 8)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def test_training_reduces_reconstruction_loss():
    params = emb.init_params(jax.random.key(1), CFG)
    step, opt = emb.make_train_step(CFG, 1e-2)
    opt_state = opt.init(params)
    rng = np.random.default_rng(2)
    # structured data (smooth sinusoids) so the AE has something to learn
    t = np.linspace(0, 6, 30)[None, :, None]
    phase = rng.uniform(0, 6, size=(16, 1, 333))
    batch = jnp.asarray(0.5 * np.sin(t + phase), jnp.float32)
    first = last = None
    for i in range(200):
        params, opt_state, loss = step(params, opt_state, batch)
        first = float(loss) if first is None else first
        last = float(loss)
    assert last < first * 0.5, (first, last)


def test_save_load_roundtrip(tmp_path):
    params = emb.init_params(jax.random.key(3), CFG)
    p = tmp_path / "e.npz"
    emb.save(p, params, CFG, "unit-test provenance")
    params2, cfg2, prov = emb.load(p)
    assert cfg2 == CFG and prov == "unit-test provenance"
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 30, 333)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(emb.embed(params, CFG, x)), np.asarray(emb.embed(params2, cfg2, x))
    )


def test_runner_reports_fgd_embedder():
    prior = PriorConfig(nfeats=333, latent_dim=16, ff_size=32, num_layers=3,
                        num_heads=2, window=30)
    den = DenoiserConfig(latent_dim=16, ff_size=32, num_layers=3, num_heads=2,
                         cond_dim=12)
    ast = ASTConfig(embed_dim=16, depth=1, num_heads=2, feature_dim=12)
    params = init_random_params(0, prior, den, ast, dtype=jnp.float32)
    pipe = GesturePipeline(params, prior, den, ast, dtype=jnp.float32,
                           num_inference_steps=3)
    eparams = emb.init_params(jax.random.key(4), CFG)

    results = evaluate_cache(
        pipe, FakeCache(), batch_size=4, embedder=(eparams, CFG, "test-prov")
    )
    assert np.isfinite(results["fgd_embedder"])
    assert results["fgd_embedder_provenance"] == "test-prov"
    # the embedder space is genuinely different from the prior latent space
    assert results["fgd_embedder"] != results["fgd"]


def test_committed_synthetic_artifact_loads():
    """The checked-in weights must stay loadable and carry provenance."""
    assert emb.DEFAULT_WEIGHTS.exists()
    params, cfg, prov = emb.load(emb.DEFAULT_WEIGHTS)
    assert "train_embedder" in prov
    x = jnp.zeros((1, cfg.window, cfg.in_dim))
    z = emb.embed(params, cfg, x)
    assert z.shape == (1, cfg.latent_dim)
    assert bool(jnp.all(jnp.isfinite(z)))
