"""Legacy "diffusion"-tag family members: shapes, gradients, semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amuse_tpu.models import legacy_family as lf


class TestTextEncoder:
    def test_frozen_gpt2_projection(self):
        m = lf.TextEncoder(latent_dim=32)
        ids = jnp.array([[1, 5, 9, 2], [3, 3, 0, 0]], jnp.int32)
        mask = jnp.array([[1, 1, 1, 1], [1, 1, 0, 0]], jnp.int32)
        variables = m.init(jax.random.key(0), ids, mask)
        out = m.apply(variables, ids, mask)
        assert out.shape == (2, 4, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_backbone_receives_no_gradient(self):
        m = lf.TextEncoder(latent_dim=8)
        ids = jnp.ones((1, 3), jnp.int32)
        variables = m.init(jax.random.key(0), ids)

        def loss(params):
            return jnp.sum(m.apply({"params": params}, ids) ** 2)

        g = jax.grad(loss)(variables["params"])
        backbone_norm = sum(
            float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["backbone"])
        )
        proj_norm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["proj"]))
        assert backbone_norm == 0.0  # frozen, like the reference's GPT-2
        assert proj_norm > 0.0


class TestConvStacks:
    def test_facenet_shapes(self):
        m = lf.FaceNet(latent_dim=32)
        x = jnp.ones((2, 30, 51))
        variables = m.init(jax.random.key(0), x)
        out = m.apply(variables, x)
        assert out.shape == (2, 30, 32)

    def test_facenet_batchnorm_train_state(self):
        m = lf.FaceNet(latent_dim=16)
        x = jax.random.normal(jax.random.key(1), (2, 20, 8))
        variables = m.init(jax.random.key(0), x, train=True)
        out, mutated = m.apply(variables, x, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 20, 16)
        # running stats moved away from init
        leaves = jax.tree.leaves(mutated["batch_stats"])
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)

    def test_tcn_causal(self):
        """Causality: output at frame t must not depend on frames > t."""
        m = lf.TemporalConvNet((8, 8))
        x = jax.random.normal(jax.random.key(0), (1, 16, 4))
        variables = m.init(jax.random.key(1), x)
        base = m.apply(variables, x)
        x2 = x.at[0, 10].set(99.0)  # perturb a late frame
        out2 = m.apply(variables, x2)
        np.testing.assert_allclose(
            np.asarray(base[0, :10]), np.asarray(out2[0, :10]), atol=1e-5
        )
        assert not np.allclose(np.asarray(base[0, 10:]), np.asarray(out2[0, 10:]))


class TestCondStreams:
    def test_audio_net_disentangled(self):
        m = lf.AudioNet(latent_dim=16)
        out = m.apply(m.init(jax.random.key(0), jnp.ones((2, 10, 256))), jnp.ones((2, 10, 256)))
        assert out.shape == (2, 10, 16)

    def test_audio_net_combined_tcn(self):
        m = lf.AudioNet(latent_dim=16, disentangled=False, tcn_channels=(12,))
        x = jnp.ones((2, 10, 28))
        out = m.apply(m.init(jax.random.key(0), x), x)
        assert out.shape == (2, 10, 16)

    def test_addons(self):
        emo = lf.EmotionAddon(latent_dim=16)
        ids = jnp.zeros((2, 10), jnp.int32)
        v = emo.init(jax.random.key(0), ids)
        assert emo.apply(v, ids).shape == (2, 10, 16)
        spk = lf.SpeakerAddon(latent_dim=16)
        v = spk.init(jax.random.key(0), ids)
        assert spk.apply(v, ids).shape == (2, 10, 16)


class TestCaMNGenerator:
    def test_full_conditioning_forward_and_grad(self):
        cfg = lf.CaMNConfig(nfeats=24, latent_dim=32, fusion_dim=16, num_layers=2)
        m = lf.CaMNPoseGenerator(cfg)
        pose = jnp.ones((2, 12, 24))
        audio = jnp.ones((2, 12, 8))
        emo = jnp.zeros((2, 12), jnp.int32)
        spk = jnp.zeros((2, 12), jnp.int32)
        txt = jnp.ones((2, 12, 6))
        variables = m.init(jax.random.key(0), pose, audio, emo, spk, txt)
        out = m.apply(variables, pose, audio, emo, spk, txt)
        assert out.shape == (2, 12, 24)

        def loss(p):
            return jnp.mean(m.apply({**variables, "params": p}, pose, audio, emo, spk, txt) ** 2)

        g = jax.grad(loss)(variables["params"])
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


class TestFaceformer:
    def test_ppe_periodicity(self):
        pe = np.asarray(lf.periodic_positional_encoding(50, 8, period=25))
        np.testing.assert_allclose(pe[:25], pe[25:50], atol=1e-6)

    def test_biased_mask_causal(self):
        m = np.asarray(lf.biased_causal_mask(6, period=2))
        assert np.isinf(m[0, 1]) and m[0, 1] < 0  # future masked
        assert m[5, 0] < m[5, 4]  # older frames get larger penalty

    def test_decoder_zero_init_and_causality(self):
        m = lf.FaceformerDecoder(n_face_feats=10, latent_dim=16, num_heads=2,
                                 ff_size=32, num_layers=1)
        face = jax.random.normal(jax.random.key(0), (1, 8, 10))
        mem = jax.random.normal(jax.random.key(1), (1, 8, 4))
        spk = jnp.zeros((1,), jnp.int32)
        variables = m.init(jax.random.key(2), face, mem, spk)
        out = m.apply(variables, face, mem, spk)
        # vertice_map_r is zero-initialised (bvh_fac_models.py:242-243)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)

    def test_teacher_forcing_is_strictly_causal(self):
        """Position t must NOT see face[t] (the reference right-shifts the
        targets with a zero start token, bvh_fac_models.py:447-449): output
        at t depends only on frames < t, so leaking the predicted frame
        into its own prediction is impossible."""
        m = lf.FaceformerDecoder(n_face_feats=10, latent_dim=16, num_heads=2,
                                 ff_size=32, num_layers=1)
        rng = jax.random.key(0)
        face = jax.random.normal(jax.random.fold_in(rng, 1), (1, 8, 10))
        mem = jax.random.normal(jax.random.fold_in(rng, 2), (1, 8, 4))
        spk = jnp.zeros((1,), jnp.int32)
        variables = m.init(jax.random.fold_in(rng, 3), face, mem, spk)
        # un-zero the readout so leakage would be visible
        params = jax.tree.map(lambda x: x, variables["params"])
        params["vertice_map_r"]["kernel"] = jax.random.normal(
            jax.random.fold_in(rng, 4), params["vertice_map_r"]["kernel"].shape
        )
        base = m.apply({"params": params}, face, mem, spk)
        # perturb frame 3: outputs at t <= 3 unchanged, some t > 3 changes
        face2 = face.at[:, 3].add(10.0)
        pert = m.apply({"params": params}, face2, mem, spk)
        np.testing.assert_allclose(
            np.asarray(pert[:, :4]), np.asarray(base[:, :4]), atol=1e-5
        )
        assert float(jnp.max(jnp.abs(pert[:, 4:] - base[:, 4:]))) > 1e-3


class TestDiscriminator:
    def test_logit_shape_and_grad(self):
        m = lf.ConvDiscriminator(channels=(8, 16))
        x = jax.random.normal(jax.random.key(0), (4, 30, 24))
        variables = m.init(jax.random.key(1), x)
        out = m.apply(variables, x)
        assert out.shape == (4,)

        def loss(p):
            return jnp.mean(m.apply({"params": p}, x) ** 2)

        g = jax.grad(loss)(variables["params"])
        assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))
