"""Numerical parity of our flax transformer primitives vs torch.nn modules.

The reference is built from torch.nn.MultiheadAttention / LayerNorm / Linear
(cross_attention.py:236-382); these tests build the same torch primitives
directly (no reference code), import their weights through
amuse_tpu.utils.torch_import, and demand elementwise agreement. This is the
foundation the released-checkpoint import rests on.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from amuse_tpu.models import denoiser as dn  # noqa: E402
from amuse_tpu.models.transformer import (  # noqa: E402
    DecoderLayer,
    EncoderLayer,
    MultiHeadAttention,
)
from amuse_tpu.utils import torch_import as ti  # noqa: E402

torch.manual_seed(0)


def to_np(t):
    return t.detach().cpu().numpy()


class TestMHAParity:
    def test_self_attention_matches_torch(self):
        d, h, b, t = 32, 4, 3, 7
        tmha = tnn.MultiheadAttention(d, h, batch_first=True)
        x = torch.randn(b, t, d)
        ref, _ = tmha(x, x, x)

        sd = ti.state_dict_to_numpy(tmha.state_dict())
        # state_dict keys have no prefix: wrap to match _mha's expectations
        sd = {f"attn.{k}": v for k, v in sd.items()}
        params = ti._mha(sd, "attn")
        mod = MultiHeadAttention(d_model=d, num_heads=h)
        out = mod.apply({"params": params}, jnp.asarray(to_np(x)), jnp.asarray(to_np(x)), jnp.asarray(to_np(x)))
        np.testing.assert_allclose(np.asarray(out), to_np(ref), atol=2e-5)

    def test_cross_attention_matches_torch(self):
        d, h = 16, 2
        tmha = tnn.MultiheadAttention(d, h, batch_first=True)
        q = torch.randn(2, 5, d)
        kv = torch.randn(2, 3, d)
        ref, _ = tmha(q, kv, kv)
        sd = {f"a.{k}": v for k, v in ti.state_dict_to_numpy(tmha.state_dict()).items()}
        params = ti._mha(sd, "a")
        out = MultiHeadAttention(d, h).apply(
            {"params": params}, jnp.asarray(to_np(q)), jnp.asarray(to_np(kv)), jnp.asarray(to_np(kv))
        )
        np.testing.assert_allclose(np.asarray(out), to_np(ref), atol=2e-5)


class TorchEncoderLayer(tnn.Module):
    """Post-norm encoder layer with torch primitives (reference semantics:
    x = norm1(x + attn(x)); x = norm2(x + ffn(x)), gelu)."""

    def __init__(self, d, h, ff, act="gelu"):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(d, h, batch_first=True)
        self.linear1 = tnn.Linear(d, ff)
        self.linear2 = tnn.Linear(ff, d)
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(d)
        self.act = tnn.GELU() if act == "gelu" else tnn.ReLU()

    def forward(self, x):
        x = self.norm1(x + self.self_attn(x, x, x)[0])
        return self.norm2(x + self.linear2(self.act(self.linear1(x))))


class TorchDecoderLayer(tnn.Module):
    def __init__(self, d, h, ff):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(d, h, batch_first=True)
        self.multihead_attn = tnn.MultiheadAttention(d, h, batch_first=True)
        self.linear1 = tnn.Linear(d, ff)
        self.linear2 = tnn.Linear(ff, d)
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(d)
        self.norm3 = tnn.LayerNorm(d)

    def forward(self, x, mem):
        x = self.norm1(x + self.self_attn(x, x, x)[0])
        x = self.norm2(x + self.multihead_attn(x, mem, mem)[0])
        return self.norm3(x + self.linear2(torch.nn.functional.gelu(self.linear1(x))))


class TestLayerParity:
    def test_encoder_layer(self):
        d, h, ff = 24, 4, 48
        tl = TorchEncoderLayer(d, h, ff)
        x = torch.randn(2, 6, d)
        ref = tl(x)
        sd = {f"l.{k}": v for k, v in ti.state_dict_to_numpy(tl.state_dict()).items()}
        params = ti.encoder_layer_from_torch(sd, "l")
        out = EncoderLayer(d, h, ff, dropout=0.0, activation="gelu").apply(
            {"params": params}, jnp.asarray(to_np(x))
        )
        np.testing.assert_allclose(np.asarray(out), to_np(ref), atol=3e-4)

    def test_decoder_layer(self):
        d, h, ff = 16, 2, 32
        tl = TorchDecoderLayer(d, h, ff)
        x, mem = torch.randn(2, 5, d), torch.randn(2, 1, d)
        ref = tl(x, mem)
        sd = {f"l.{k}": v for k, v in ti.state_dict_to_numpy(tl.state_dict()).items()}
        params = ti.decoder_layer_from_torch(sd, "l")
        out = DecoderLayer(d, h, ff, dropout=0.0, activation="gelu").apply(
            {"params": params}, jnp.asarray(to_np(x)), jnp.asarray(to_np(mem))
        )
        np.testing.assert_allclose(np.asarray(out), to_np(ref), atol=3e-4)


class TestTimestepEmbedding:
    def test_matches_ddpm_formula(self):
        # diffusers get_timestep_embedding with flip_sin_to_cos=True, shift=0
        import math

        t = np.array([0.0, 1.0, 500.0, 999.0])
        dim = 256
        half = dim // 2
        freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
        args = t[:, None] * freqs[None, :]
        expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
        out = np.asarray(dn.timestep_embedding(jnp.asarray(t), dim))
        np.testing.assert_allclose(out, expected, atol=2e-3)

    def test_silu_mlp_matches_torch(self):
        lin1, lin2 = tnn.Linear(8, 12), tnn.Linear(12, 12)
        x = torch.randn(3, 8)
        ref = lin2(torch.nn.functional.silu(lin1(x)))
        sd = ti.state_dict_to_numpy(
            {**{f"m.linear_1.{k}": v for k, v in lin1.state_dict().items()},
             **{f"m.linear_2.{k}": v for k, v in lin2.state_dict().items()}}
        )
        params = {
            "linear_1": ti._linear(sd, "m.linear_1"),
            "linear_2": ti._linear(sd, "m.linear_2"),
        }
        out = dn.TimestepMLP(12).apply({"params": params}, jnp.asarray(to_np(x)))
        np.testing.assert_allclose(np.asarray(out), to_np(ref), atol=1e-5)


class TestHFDeiTParity:
    def test_vit_backbone_matches_hf_deit(self):
        """Third-party oracle for the whole ViT backbone: huggingface
        transformers' DeiTModel (independent torch implementation of the
        distilled ViT the AST wraps, audio_main_new.py:49-163). A tiny
        randomly-initialised DeiT forward must match our ASTEncoder's
        embeddings + blocks + final LayerNorm bit-for-bit-ish when weights
        are imported via vit_from_hf_deit."""
        import jax

        from transformers import DeiTConfig, DeiTModel

        from amuse_tpu.models.ast import ASTConfig, ASTEncoder

        torch.manual_seed(7)
        hf_cfg = DeiTConfig(
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=256,
            image_size=32,
            patch_size=16,
            num_channels=1,
            hidden_act="gelu",
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            layer_norm_eps=1e-6,
        )
        hf = DeiTModel(hf_cfg, add_pooling_layer=False).eval()
        img = torch.randn(2, 1, 32, 32)
        with torch.no_grad():
            ref = hf(img).last_hidden_state  # (2, 2+4, 64)

        cfg = ASTConfig(
            input_tdim=32, input_fdim=32, fstride=16, tstride=16,
            embed_dim=64, depth=2, num_heads=4, remat=False,
        )
        assert cfg.num_patches == 4
        model = ASTEncoder(cfg)
        spec = jnp.asarray(to_np(img)[:, 0]).swapaxes(-1, -2)  # (B, T=W, F=H)
        params = model.init(jax.random.key(0), spec)["params"]
        imported = ti.vit_from_hf_deit(
            ti.state_dict_to_numpy(hf.state_dict()), depth=2
        )
        params = {**params, **imported}  # heads stay at init (unused here)
        _, state = model.apply(
            {"params": params}, spec, capture_intermediates=True
        )
        mine = np.asarray(state["intermediates"]["norm"]["__call__"][0])
        np.testing.assert_allclose(mine, to_np(ref), atol=2e-4)


class TestPatchEmbedParity:
    def test_patch_matmul_equals_conv2d(self):
        # Conv2d(1, E, 16, stride=(10, 10)) over (B, 1, 128, 1024) must equal
        # extract_patches + matmul with the importer's kernel layout.
        from amuse_tpu.models.ast import ASTConfig, extract_patches

        e = 8
        conv = tnn.Conv2d(1, e, kernel_size=16, stride=(10, 10))
        spec_t = torch.randn(2, 128, 1024)  # (B, F, T)
        ref = conv(spec_t.unsqueeze(1))  # (B, E, 12, 101)
        ref = ref.flatten(2).transpose(1, 2)  # (B, 1212, E)

        cfg = ASTConfig(embed_dim=e)
        spec = jnp.asarray(to_np(spec_t)).swapaxes(-1, -2)  # ours: (B, T, F)
        patches = extract_patches(spec, cfg)
        w = to_np(conv.weight).reshape(e, -1).T  # (256, E)
        out = np.asarray(patches) @ w + to_np(conv.bias)
        np.testing.assert_allclose(out, to_np(ref), atol=1e-4)
