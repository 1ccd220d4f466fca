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
