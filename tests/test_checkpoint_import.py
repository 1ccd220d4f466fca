"""Structural round-trip of the torch checkpoint importer.

Builds synthetic state_dicts with the reference's exact key naming (prior:
vae.py:93-146, denoiser: denoiser.py:64-105, AST: audio_main_new.py/AST_EVP)
at small dims, maps them through amuse_tpu.utils.torch_import, and runs the
flax models with the imported trees - catching any param-tree naming or
shape mismatch that would break real released-checkpoint import.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amuse_tpu.models.denoiser import Denoiser, DenoiserConfig
from amuse_tpu.models.vae import MotionPrior, PriorConfig
from amuse_tpu.utils import torch_import as ti

rng = np.random.default_rng(0)


import functools

from tests import torch_sd as _sd

# shared builders (tests/torch_sd.py), bound to this module's rng
lin = functools.partial(_sd.lin, rng)
ln = functools.partial(_sd.ln, rng)
mha = functools.partial(_sd.mha, rng)
enc_layer = functools.partial(_sd.enc_layer, rng)
dec_layer = functools.partial(_sd.dec_layer, rng)


def skip_stack(prefix, d, ff, layers, sd, decoder=False):
    n = (layers - 1) // 2
    layer = dec_layer if decoder else enc_layer
    for i in range(n):
        layer(f"{prefix}.input_blocks.{i}", d, ff, sd)
        layer(f"{prefix}.output_blocks.{i}", d, ff, sd)
        lin(f"{prefix}.linear_blocks.{i}", 2 * d, d, sd)
    layer(f"{prefix}.middle_block", d, ff, sd)
    ln(f"{prefix}.norm", d, sd)


class TestPriorImport:
    def test_import_and_run(self):
        d, ff, layers, nfeats, win = 16, 32, 3, 33, 12
        sd = {}
        lin("skel_embedding", nfeats, d, sd)
        lin("final_layer", d, nfeats, sd)
        sd["global_motion_token"] = rng.normal(size=(2, d)).astype(np.float32)
        sd["query_pos_encoder.pe"] = rng.uniform(size=(500, 1, d)).astype(np.float32)
        sd["query_pos_decoder.pe"] = rng.uniform(size=(500, 1, d)).astype(np.float32)
        skip_stack("encoder", d, ff, layers, sd)
        skip_stack("decoder", d, ff, layers, sd, decoder=True)

        params = ti.motion_prior_from_torch(sd, num_layers=layers)
        cfg = PriorConfig(nfeats=nfeats, latent_dim=d, ff_size=ff, num_layers=layers, num_heads=2, window=win)
        model = MotionPrior(cfg)
        # validate tree compatibility exactly against a fresh init
        ref = model.init(jax.random.key(0), jnp.zeros((1, win, nfeats)), jax.random.key(1))["params"]
        assert jax.tree.structure(ref) == jax.tree.structure(
            jax.tree.map(jnp.asarray, params)
        )
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref),
            jax.tree_util.tree_leaves_with_path(jax.tree.map(jnp.asarray, params)),
        ):
            assert a.shape == b.shape, (pa, a.shape, b.shape)

        x = jnp.asarray(rng.normal(scale=0.1, size=(2, win, nfeats)), jnp.float32)
        feats, z, _ = model.apply({"params": params}, x, jax.random.key(2))
        assert feats.shape == (2, win, nfeats)
        assert bool(jnp.all(jnp.isfinite(feats)))


class TestDenoiserImport:
    def test_import_and_run(self):
        d, ff, layers, cond = 16, 32, 3, 24
        sd = {}
        lin("time_embedding.linear_1", cond, d, sd)
        lin("time_embedding.linear_2", d, d, sd)
        for s in ("con", "emo", "sty"):
            lin(f"emb_proj_{s}.1", cond, d, sd)
        sd["query_pos.pe"] = rng.uniform(size=(500, 1, d)).astype(np.float32)
        skip_stack("encoder", d, ff, layers, sd)

        params = ti.denoiser_from_torch(sd, num_layers=layers)
        cfg = DenoiserConfig(latent_dim=d, ff_size=ff, num_layers=layers, num_heads=2, cond_dim=cond)
        model = Denoiser(cfg)
        ref = model.init(
            jax.random.key(0), jnp.zeros((1, 1, d)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, cond)), jnp.zeros((1, cond)), jnp.zeros((1, cond)),
        )["params"]
        assert jax.tree.structure(ref) == jax.tree.structure(
            jax.tree.map(jnp.asarray, params)
        )
        out = model.apply(
            {"params": params}, jnp.ones((2, 1, d)), jnp.asarray([3, 500]),
            jnp.ones((2, cond)), jnp.ones((2, cond)), jnp.ones((2, cond)),
        )
        assert out.shape == (2, 1, d)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestASTImport:
    def test_import_and_run(self):
        from amuse_tpu.models.ast import ASTConfig, ASTEncoder

        cfg = ASTConfig(input_tdim=64, input_fdim=32, embed_dim=16, depth=2, num_heads=2, feature_dim=12, label_dim=8)
        sd = {}
        p = "enc"
        sd[f"{p}.v.patch_embed.proj.weight"] = rng.normal(scale=0.05, size=(16, 1, 16, 16)).astype(np.float32)
        sd[f"{p}.v.patch_embed.proj.bias"] = np.zeros(16, np.float32)
        sd[f"{p}.v.cls_token"] = rng.normal(scale=0.02, size=(1, 1, 16)).astype(np.float32)
        sd[f"{p}.v.dist_token"] = rng.normal(scale=0.02, size=(1, 1, 16)).astype(np.float32)
        sd[f"{p}.v.pos_embed"] = rng.normal(scale=0.02, size=(1, cfg.num_patches + 2, 16)).astype(np.float32)
        ln(f"{p}.v.norm", 16, sd)
        for i in range(2):
            bp = f"{p}.v.blocks.{i}"
            ln(f"{bp}.norm1", 16, sd)
            lin(f"{bp}.attn.qkv", 16, 48, sd)
            lin(f"{bp}.attn.proj", 16, 16, sd)
            ln(f"{bp}.norm2", 16, sd)
            lin(f"{bp}.mlp.fc1", 16, 64, sd)
            lin(f"{bp}.mlp.fc2", 64, 16, sd)
        ln(f"{p}.feature_head.0", 16, sd)
        lin(f"{p}.feature_head.1", 16, 12, sd)
        ln(f"{p}.mlp_head.0", 12, sd)
        lin(f"{p}.mlp_head.1", 12, 8, sd)
        ln(f"{p}.mlp_head_featbased.0", 16, sd)
        lin(f"{p}.mlp_head_featbased.1", 16, 8, sd)

        params = ti.ast_encoder_from_torch(sd, p, depth=2, label_dim=8)
        model = ASTEncoder(cfg)
        ref = model.init(jax.random.key(0), jnp.zeros((1, 64, 32)))["params"]
        got = jax.tree.map(jnp.asarray, params)
        # frame_based path init may not create mlp_ln/mlp_fc; compare key sets
        ref_keys = set(ref)
        got_keys = set(got)
        assert ref_keys <= got_keys, ref_keys - got_keys
        out = model.apply(
            {"params": {k: got[k] for k in got}},
            jnp.asarray(rng.normal(size=(2, 64, 32)), jnp.float32),
        )
        assert out["feature"].shape == (2, 12)
        assert out["logits"].shape == (2, 8)


class TestDataParallelLayouts:
    """nn.DataParallel saves every key under ``module.`` (the reference
    wraps its stage-1 model, trainer.py:203-206, and saves the wrapped
    state_dict, :328). The importer must accept wrapped and bare layouts
    identically (round-3 verdict item 5)."""

    def test_wrapped_equals_bare(self):
        sd = {"a.weight": np.ones((2, 2), np.float32), "b.bias": np.zeros(2, np.float32)}
        wrapped = {f"module.{k}": v for k, v in sd.items()}
        got = ti.state_dict_to_numpy(wrapped)
        want = ti.state_dict_to_numpy(sd)
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k])

    def test_partial_module_prefix_untouched(self):
        # a genuine top-level submodule named "module" alongside other keys
        # must NOT be stripped
        sd = {"module.a.weight": np.ones(2, np.float32), "head.bias": np.zeros(2, np.float32)}
        got = ti.state_dict_to_numpy(sd)
        assert set(got) == {"module.a.weight", "head.bias"}

    def test_empty_dict(self):
        assert ti.strip_dataparallel_prefix({}) == {}


class TestFilenameGrammarFuzz:
    """Fuzz the best-checkpoint selection against the reference's EXACT
    save-format strings (trainer.py:328 for stage-1, :470-496 for stage-2)
    and its selection rules (infer_ldm.py:79-105,
    infer_pretrained_ast_evp.py:22-31)."""

    @staticmethod
    def _stage2_name(kind, total, epoch, rng):
        v = rng.uniform(0, 9, size=8)
        return (
            f"{kind}_recF{v[0]:.4f}_recJ{v[1]:.4f}_kl{v[2]:.4f}_genF{v[3]:.4f}"
            f"_genJ{v[4]:.4f}_instL{v[5]:.4f}_vtexR{v[6]:.4f}_vtexG{v[7]:.4f}"
            f"_total{total:.4f}_e{epoch}.pt"
        )

    @staticmethod
    def _ast_name(epoch, tL, tEA, tPA, vL, vEA, vPA):
        return (
            f"model_{epoch}_tL{tL:.8f}_tEA{tEA:.8f}_tPA{tPA:.8f}"
            f"_vL{vL:.8f}_vEA{vEA:.8f}_vPA{vPA:.8f}.pkl"
        )

    def test_latdiff_min_total_and_epoch(self):
        from pathlib import Path

        from amuse_tpu.utils import checkpoint_io as cio

        for seed in range(10):
            rng = np.random.default_rng(seed)
            totals = rng.uniform(0.01, 99.0, size=12)
            epochs = rng.permutation(np.arange(1, 13)) * 10
            paths = [
                Path(self._stage2_name("latdiff_model_wOpt", t, e, rng))
                for t, e in zip(totals, epochs)
            ]
            best, epoch = cio.select_latdiff_checkpoint(paths)
            k = int(np.argmin(totals))
            assert best == paths[k], (seed, best, totals)
            assert epoch == int(epochs[k])

    def test_prior_selected_by_latdiff_epoch(self):
        from pathlib import Path

        from amuse_tpu.utils import checkpoint_io as cio

        rng = np.random.default_rng(0)
        priors = [
            Path(self._stage2_name("prior_model_NoOpt", rng.uniform(0.1, 5), e, rng))
            for e in (100, 200, 300)
        ]
        # infer_ldm.py:105: load_epoch_prior = chosen ldm epoch
        assert cio.select_prior_checkpoint(priors, 200) == priors[1]
        # curated single-file release with no matching epoch: min total
        lone = [Path(self._stage2_name("prior_model_NoOpt", 1.0, 999, rng))]
        assert cio.select_prior_checkpoint(lone, 200) == lone[0]

    def test_ast_max_tea_and_identity_ablation(self):
        from pathlib import Path

        from amuse_tpu.utils import checkpoint_io as cio

        for seed in range(10):
            rng = np.random.default_rng(100 + seed)
            tea = rng.uniform(0, 1, size=8)
            tpa = rng.uniform(0, 1, size=8)
            paths = [
                Path(self._ast_name(e + 1, rng.uniform(0, 2), tea[e], tpa[e],
                                    rng.uniform(0, 2), rng.uniform(0, 1), rng.uniform(0, 1)))
                for e in range(8)
            ]
            assert cio.select_ast_checkpoint(paths) == paths[int(np.argmax(tea))]
            assert (
                cio.select_ast_checkpoint(paths, ablation="identity")
                == paths[int(np.argmax(tpa))]
            )

    def test_ast_epoch_zero_quirk(self):
        from pathlib import Path

        from amuse_tpu.utils import checkpoint_io as cio

        # the winner was saved at epoch 0 -> reference re-picks the "_1_"
        # file (infer_pretrained_ast_evp.py:31)
        rng = np.random.default_rng(1)
        p0 = Path(self._ast_name(0, 1.0, 0.99, 0.5, 1.0, 0.9, 0.5))
        p1 = Path(self._ast_name(1, 1.0, 0.10, 0.5, 1.0, 0.9, 0.5))
        assert cio.select_ast_checkpoint([p0, p1]) == p1

    def test_unparseable_names_fall_back(self):
        from pathlib import Path

        from amuse_tpu.utils import checkpoint_io as cio

        paths = [Path("latdiff_final.pt"), Path("latdiff_release.pt")]
        best, epoch = cio.select_latdiff_checkpoint(paths)
        assert best == paths[-1]  # lexicographic fallback, never a crash
        assert cio.select_ast_checkpoint([Path("ast.pkl")]) == Path("ast.pkl")
