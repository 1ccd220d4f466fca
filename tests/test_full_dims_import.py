"""Full-dims checkpoint-import rehearsal + the ImageNet pos-emb surgery.

Round-2 verdict item 5: the importer round-trip previously ran only at
16-dim toy scale. Here a synthetic reference-keyed checkpoint at REAL dims
(AST 3x ViT-base 768/12 incl. the 1-channel patch conv, prior 333-nfeats/
9-layer, denoiser 9-layer) goes through the import and the fused pipeline,
and the output is pinned against a committed golden
(tests/goldens/make_fulldims_golden.py).

The ImageNet-init surgery (audio_main_new.py:90-115: channel-summed patch
conv + middle-cut / bilinear pos-emb resampling) is pinned against torch's
``F.interpolate`` executed live.
"""

import numpy as np
import pytest
import torch

from amuse_tpu.utils import torch_import as ti


class TestImagenetPosEmbedSurgery:
    def _reference_recipe(self, pos_embed: np.ndarray, f_dim: int, t_dim: int):
        """The reference's exact torch code path (audio_main_new.py:99-115)."""
        orig_hw, e = 24, pos_embed.shape[-1]
        pe = torch.from_numpy(pos_embed)
        new = (
            pe[:, 2:, :]
            .reshape(1, orig_hw * orig_hw, e)
            .transpose(1, 2)
            .reshape(1, e, orig_hw, orig_hw)
        )
        if t_dim <= orig_hw:
            lo = orig_hw // 2 - t_dim // 2
            new = new[:, :, :, lo : lo + t_dim]
        else:
            new = torch.nn.functional.interpolate(
                new, size=(orig_hw, t_dim), mode="bilinear"
            )
        if f_dim <= orig_hw:
            lo = orig_hw // 2 - f_dim // 2
            new = new[:, :, lo : lo + f_dim, :]
        else:
            new = torch.nn.functional.interpolate(
                new, size=(f_dim, t_dim), mode="bilinear"
            )
        new = new.reshape(1, e, f_dim * t_dim).transpose(1, 2)
        return torch.cat([pe[:, :2, :], new], dim=1).numpy()

    @pytest.mark.parametrize(
        "f_dim,t_dim",
        [(12, 101), (12, 12), (32, 101), (24, 24)],
        ids=["ast-flagship", "both-cut", "freq-interp", "identity"],
    )
    def test_matches_torch_interpolate(self, f_dim, t_dim):
        rng = np.random.default_rng(0)
        pos = rng.normal(scale=0.02, size=(1, 24 * 24 + 2, 32)).astype(np.float32)
        ours = ti.ast_pos_embed_from_imagenet(pos, f_dim, t_dim)
        ref = self._reference_recipe(pos, f_dim, t_dim)
        assert ours.shape == (1, f_dim * t_dim + 2, 32)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_conv_channel_sum_and_full_vit(self):
        """vit_from_imagenet_deit_for_ast: 3-channel ImageNet conv summed to
        1 channel; pos-emb resampled to the AST grid; result loads into the
        flax ASTEncoder and runs."""
        import jax
        import jax.numpy as jnp

        from amuse_tpu.models.ast import ASTConfig, ASTEncoder
        from tests import torch_sd as tsd

        rng = np.random.default_rng(1)
        e, depth = 32, 2
        sd: dict = {}
        # HF DeiT naming at toy width but IMAGE dims (3 channels, 24x24 grid)
        sd["embeddings.patch_embeddings.projection.weight"] = rng.normal(
            scale=0.02, size=(e, 3, 16, 16)
        ).astype(np.float32)
        sd["embeddings.patch_embeddings.projection.bias"] = np.zeros(e, np.float32)
        sd["embeddings.cls_token"] = rng.normal(scale=0.02, size=(1, 1, e)).astype(np.float32)
        sd["embeddings.distillation_token"] = rng.normal(scale=0.02, size=(1, 1, e)).astype(np.float32)
        sd["embeddings.position_embeddings"] = rng.normal(
            scale=0.02, size=(1, 24 * 24 + 2, e)
        ).astype(np.float32)
        for i in range(depth):
            p = f"encoder.layer.{i}"
            for n in ("query", "key", "value"):
                tsd.lin(rng, f"{p}.attention.attention.{n}", e, e, sd)
            tsd.lin(rng, f"{p}.attention.output.dense", e, e, sd)
            tsd.ln(rng, f"{p}.layernorm_before", e, sd)
            tsd.ln(rng, f"{p}.layernorm_after", e, sd)
            tsd.lin(rng, f"{p}.intermediate.dense", e, 4 * e, sd)
            tsd.lin(rng, f"{p}.output.dense", 4 * e, e, sd)
        tsd.ln(rng, "layernorm", e, sd)

        cfg = ASTConfig(
            input_tdim=64, input_fdim=32, embed_dim=e, depth=depth,
            num_heads=2, feature_dim=16,
        )
        # AST 64x32 grid: f_dim=(32-16)//10+1=2, t_dim=(64-16)//10+1=5
        vit = ti.vit_from_imagenet_deit_for_ast(sd, depth, f_dim=2, t_dim=5)
        assert vit["pos_embed"].shape == (1, 2 * 5 + 2, e)
        assert vit["patch_proj"]["kernel"].shape == (256, e)
        # channel sum: kernel equals the RGB kernels' sum
        conv = sd["embeddings.patch_embeddings.projection.weight"]
        np.testing.assert_allclose(
            vit["patch_proj"]["kernel"],
            conv.sum(1).reshape(e, -1).T,
            rtol=1e-6,
        )

        model = ASTEncoder(cfg)
        ref = model.init(jax.random.key(0), jnp.zeros((1, 64, 32)))["params"]
        init_like = dict(ref)
        init_like.update(vit)  # ViT subtree imported; heads stay random-init
        out = model.apply(
            {"params": init_like},
            jnp.asarray(rng.normal(size=(2, 64, 32)), jnp.float32),
        )
        assert out["feature"].shape == (2, 16)
        assert bool(np.isfinite(np.asarray(out["feature"])).all())


@pytest.mark.integration
def test_full_dims_import_matches_golden():
    """AST 768/12 x3 + prior 333/9 + denoiser at full dims: import, run the
    fused pipeline on a 10 s chunk, compare against the committed golden.
    ~3-6 min on the 1-core CPU host (one ViT-base-x3 forward + 50-step DDIM)."""
    from tests.goldens.make_fulldims_golden import OUT, run_pipeline, summarize

    assert OUT.exists(), "run tests/goldens/make_fulldims_golden.py first"
    gold = np.load(OUT)
    poses, trans = run_pipeline()
    assert poses.shape == (300, 55, 3) and trans.shape == (300, 3)
    got = summarize(poses, trans)
    for k in gold.files:
        np.testing.assert_allclose(
            got[k], gold[k], rtol=2e-3, atol=2e-4,
            err_msg=f"full-dims import drifted from golden at {k}",
        )


@pytest.mark.integration
def test_hf_deit_import_matches_golden():
    """Installed-transformers DeiTModel at base-distilled-384 dims ->
    ImageNet->AST surgery (channel-summed conv, 24x24+2 -> 12x101 pos-emb)
    into all three encoders -> full fused pipeline on a 10 s WAV, vs the
    committed golden. The closest real-weights end-to-end proxy available
    offline (VERDICT r4 item 6); the strict load_state_dict inside the
    golden maker also fails loudly if a transformers upgrade renames keys.
    ~3-6 min on the 1-core CPU host."""
    from tests.goldens.make_hfdeit_golden import OUT, run_pipeline, summarize

    assert OUT.exists(), "run tests/goldens/make_hfdeit_golden.py first"
    gold = np.load(OUT)
    poses, trans, con = run_pipeline()
    assert poses.shape == (300, 55, 3) and trans.shape == (300, 3)
    got = summarize(poses, trans, con)
    for k in gold.files:
        np.testing.assert_allclose(
            got[k], gold[k], rtol=2e-3, atol=2e-4,
            err_msg=f"HF-DeiT import drifted from golden at {k}",
        )


def test_gelu_tanh_knob_close_but_not_identical():
    """ASTConfig.gelu_tanh (perf knob) stays within ~1e-2 of the exact-erf
    parity path on a tiny encoder, and actually changes the computation."""
    import jax
    import jax.numpy as jnp

    from amuse_tpu.models.ast import ASTConfig, ASTEncoder

    rng_np = np.random.default_rng(0)
    x = jnp.asarray(rng_np.normal(size=(2, 64, 32)), jnp.float32)
    kw = dict(input_tdim=64, input_fdim=32, embed_dim=16, depth=2,
              num_heads=2, feature_dim=12)
    m_erf = ASTEncoder(ASTConfig(**kw))
    params = m_erf.init(jax.random.key(0), x)["params"]
    f_erf = m_erf.apply({"params": params}, x)["feature"]
    f_tanh = ASTEncoder(ASTConfig(gelu_tanh=True, **kw)).apply(
        {"params": params}, x
    )["feature"]
    d = np.abs(np.asarray(f_erf) - np.asarray(f_tanh))
    assert d.max() > 0  # the knob does something
    assert d.max() < 5e-2, d.max()  # and stays close to parity
