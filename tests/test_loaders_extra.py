"""Coverage for the SMPL-X npz loader, eval-set builders, and the full
AST_EVP importer path."""

import numpy as np
import jax
import jax.numpy as jnp

from amuse_tpu.core import smplx


class TestSmplxLoader:
    def test_load_published_format(self, tmp_path):
        # synthetic npz in the published SMPL-X layout
        rng = np.random.default_rng(0)
        v, j, nb = 30, 5, 12
        kintree = np.zeros((2, j), np.int64)
        kintree[0] = [2**32 - 1, 0, 1, 1, 3]  # parent row; root sentinel
        np.savez(
            tmp_path / "SMPLX_TEST.npz",
            v_template=rng.normal(size=(v, 3)),
            shapedirs=0.01 * rng.normal(size=(v, 3, nb)),
            posedirs=0.001 * rng.normal(size=(v, 3, (j - 1) * 9)),
            J_regressor=rng.dirichlet(np.ones(v), size=j),
            weights=rng.dirichlet(np.ones(j), size=v),
            kintree_table=kintree,
        )
        m = smplx.load_model(tmp_path / "SMPLX_TEST.npz", num_betas=8, num_expr=4)
        assert m.num_vertices == v and m.num_joints == j
        assert m.parents[0] == -1
        assert m.posedirs.shape == ((j - 1) * 9, v * 3)
        out = smplx.forward(
            m, jnp.zeros(j * 3), jnp.zeros(8), jnp.zeros(3), expression=jnp.zeros(0)
        )
        np.testing.assert_allclose(
            np.asarray(out["vertices"]), np.asarray(m.v_template), atol=1e-5
        )


class TestEvalSets:
    def _tree(self, tmp_path):
        from amuse_tpu.audio.wavio import save_wav
        from amuse_tpu.data.beat import discover

        rng = np.random.default_rng(1)
        root = tmp_path / "beat"
        mosh = tmp_path / "mosh"
        mosh.mkdir()
        for actor_id, name in [(2, "scott"), (9, "miranda")]:
            d = root / str(actor_id)
            d.mkdir(parents=True)
            for take in ("0_65_65", "0_66_66", "0_73_73"):
                stem = f"{actor_id}_{name}_{take}"
                save_wav(d / f"{stem}.wav", rng.normal(scale=0.03, size=170000).astype(np.float32))
                np.savez(
                    mosh / f"{stem}.npz",
                    poses=rng.normal(size=(310, 165)).astype(np.float32),
                    trans=rng.normal(size=(310, 3)).astype(np.float32),
                )
        return discover(root, mosh)

    def test_style_transfer_set(self, tmp_path):
        from amuse_tpu.data.eval_sets import style_transfer_set

        takes = self._tree(tmp_path)
        a1, a2 = style_transfer_set(takes, "scott", "miranda", "happy")
        assert [t.take for t in a1] == ["0_65_65", "0_66_66"]
        assert a1[0].motion.shape[1] == 168
        assert a1[0].waveform.shape[-1] == 170000

    def test_style_xemo_set(self, tmp_path):
        from amuse_tpu.data.eval_sets import style_xemo_set

        takes = self._tree(tmp_path)
        corners = style_xemo_set(takes, "scott", "miranda", "angry", "happy")
        assert set(corners) == {"a1_e1", "a1_e2", "a2_e1", "a2_e2"}
        assert corners["a1_e1"].take == "0_73_73"
        assert corners["a2_e2"].actor == "miranda"

    def test_emotion_control_set(self, tmp_path):
        from amuse_tpu.data.eval_sets import emotion_control_set

        takes = self._tree(tmp_path)
        items = emotion_control_set(takes, "scott", ["happy", "angry"])
        assert [i.emotion for i in items] == ["happy", "angry"]


class TestFullASTImport:
    def test_disentangler_import_runs(self):
        """Synthetic reference-named AST_EVP state_dict at tiny dims ->
        flax ASTDisentangler params -> forward runs."""
        from amuse_tpu.models.ast import ASTConfig, ASTDisentangler
        from amuse_tpu.utils import torch_import as ti

        import functools

        from tests import torch_sd as _sd

        rng = np.random.default_rng(2)
        lin = functools.partial(_sd.lin, rng)
        ln = functools.partial(_sd.ln, rng)
        mha = functools.partial(_sd.mha, rng)
        enc_layer = functools.partial(
            lambda r, prefix, d, sd: _sd.enc_layer(r, prefix, d, 2048, sd), rng
        )

        cfg = ASTConfig(input_tdim=64, input_fdim=32, embed_dim=16, depth=1,
                        num_heads=2, feature_dim=8)
        sd = {}
        for enc_name, label in (("emo_enc", 8), ("sty_enc", 30), ("con_enc", 0)):
            p = enc_name
            lin(f"{p}.v.patch_embed.proj", 0, 0, sd)  # replaced below
            sd[f"{p}.v.patch_embed.proj.weight"] = rng.normal(scale=0.05, size=(16, 1, 16, 16)).astype(np.float32)
            sd[f"{p}.v.patch_embed.proj.bias"] = np.zeros(16, np.float32)
            sd[f"{p}.v.cls_token"] = np.zeros((1, 1, 16), np.float32)
            sd[f"{p}.v.dist_token"] = np.zeros((1, 1, 16), np.float32)
            sd[f"{p}.v.pos_embed"] = np.zeros((1, cfg.num_patches + 2, 16), np.float32)
            ln(f"{p}.v.norm", 16, sd)
            bp = f"{p}.v.blocks.0"
            ln(f"{bp}.norm1", 16, sd)
            lin(f"{bp}.attn.qkv", 16, 48, sd)
            lin(f"{bp}.attn.proj", 16, 16, sd)
            ln(f"{bp}.norm2", 16, sd)
            lin(f"{bp}.mlp.fc1", 16, 64, sd)
            lin(f"{bp}.mlp.fc2", 64, 16, sd)
            ln(f"{p}.feature_head.0", 16, sd)
            lin(f"{p}.feature_head.1", 16, 8, sd)
            if label:
                ln(f"{p}.mlp_head.0", 8, sd)
                lin(f"{p}.mlp_head.1", 8, label, sd)
                ln(f"{p}.mlp_head_featbased.0", 16, sd)
                lin(f"{p}.mlp_head_featbased.1", 16, label, sd)
        for block, nl, in_dim in (("fusion", 2, 24), ("fusion_ablation", 2, 16)):
            for i in range(nl):
                enc_layer(f"{block}.layers.{i}", in_dim, sd)
            ln(f"{block}.norm", in_dim, sd)
            lin(f"{block}.fc", in_dim, 12, sd)
        for i in range(4):
            enc_layer(f"decode.layers.{i}", 12, sd)
        ln(f"decode.norm", 12, sd)
        lin("decode.projection.0", 12, 24, sd)
        lin("decode.projection.2", 24, 64 * 32, sd)

        params = ti.ast_disentangler_from_torch(dict(sd), depth=1)

        model = ASTDisentangler(dtype=jnp.float32, base_cfg=cfg, fusion_dim=12)
        spec = jnp.asarray(rng.normal(size=(2, 64, 32)), jnp.float32)
        ref = model.init(jax.random.key(0), spec)["params"]
        got = jax.tree.map(jnp.asarray, params)
        assert set(ref) <= set(got), set(ref) - set(got)
        fbanks, enc = model.apply({"params": got}, spec)
        assert fbanks.shape == (2, 64, 32)
        assert enc["emo"]["feature"].shape == (2, 8)


class TestTranscripts:
    def test_vendored_corpus_covers_pretrained_takes(self):
        from amuse_tpu.data.actors import PRETRAINED_TAKES
        from amuse_tpu.data.corpus import take_transcript

        for pair in PRETRAINED_TAKES.values():
            for take in pair:
                text = take_transcript(take)
                assert text and len(text) > 100, take

    def test_unknown_take_is_none(self):
        from amuse_tpu.data.corpus import take_transcript

        assert take_transcript("9_99_99") is None

    def test_encode_take_transcript(self):
        from amuse_tpu.data.corpus import encode_take_transcript

        v = encode_take_transcript("0_9_9", dim=32)
        assert v is not None and v.shape == (32,)


class TestDegenerateDataInputs:
    def test_empty_emotion_csv_defaults_to_neutral(self, tmp_path):
        import warnings

        from amuse_tpu.data.beat import emotion_label

        p = tmp_path / "e.csv"
        p.write_text("")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            assert emotion_label(p) == 0

    def test_facial_frame_rate_short_capture(self):
        from amuse_tpu.data.facial import facial_frame_rate

        short = {"frames": [{"time": 0.0}, {"time": 0.1}]}
        assert abs(facial_frame_rate(short) - 10.0) < 1e-6
        assert facial_frame_rate({"frames": []}) == 60.0
        dup = {"frames": [{"time": 1.0}] * 25}
        assert facial_frame_rate(dup) == 60.0  # zero dt -> default

    def test_encode_dialogue_empty_text_is_zeros(self):
        from amuse_tpu.data.corpus import encode_dialogue

        v = encode_dialogue("   ", dim=16)
        np.testing.assert_array_equal(v, 0.0)

    def test_merge_caches_refuses_mixed_ast_sources(self, tmp_path):
        import json

        import pytest

        from amuse_tpu.data.cache import merge_caches

        for i, srcname in enumerate(["random-weights", "/ckpt/run1"]):
            d = tmp_path / f"c{i}"
            d.mkdir()
            (d / "manifest.json").write_text(json.dumps(
                {"num_windows": 0, "shards": [], "fields": [], "ast_source": srcname}
            ))
        with pytest.raises(RuntimeError, match="DIFFERENT AST weights"):
            merge_caches([tmp_path / "c0", tmp_path / "c1"], tmp_path / "out")
