"""The smplx_rep="3D" / skip_trans configuration paths (reference:
trainer.py:363-376, denoiser.py:24-31) and the round-3 review findings that
exposed them: the train step previously hardcoded the 6D featurization, so
any non-default rep crashed inside jit with a dot-shape error."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amuse_tpu.core import motion as motion_mod
from amuse_tpu.core import smplx as smplx_mod
from amuse_tpu.models.denoiser import DenoiserConfig
from amuse_tpu.models.vae import PriorConfig
from amuse_tpu.train import gesture

DEN = DenoiserConfig(latent_dim=16, ff_size=32, num_layers=3, num_heads=2, cond_dim=24)


def prior_cfg(nfeats):
    return PriorConfig(nfeats=nfeats, latent_dim=16, ff_size=32,
                       num_layers=3, num_heads=2, window=12)


def tiny_batch(b=2):
    rng = np.random.default_rng(0)
    return {
        "motion": jnp.asarray(rng.normal(scale=0.1, size=(b, 12, 168)), jnp.float32),
        "con": jnp.asarray(rng.normal(size=(b, 24)), jnp.float32),
        "emo": jnp.asarray(rng.normal(size=(b, 24)), jnp.float32),
        "sty": jnp.asarray(rng.normal(size=(b, 24)), jnp.float32),
        "betas": jnp.zeros((b, 8)),
    }


class TestFeaturize:
    def test_6d_matches_legacy(self):
        m = jnp.asarray(np.random.default_rng(1).normal(size=(2, 5, 168)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(motion_mod.featurize(m, "6D")),
            np.asarray(motion_mod.axis_angle_to_feats6d(m)),
        )

    def test_3d_is_identity_and_round_trips(self):
        m = jnp.asarray(np.random.default_rng(2).normal(size=(2, 5, 168)), jnp.float32)
        f = motion_mod.featurize(m, "3D")
        assert f.shape == (2, 5, 168)
        np.testing.assert_array_equal(np.asarray(f), np.asarray(m))
        aa, tr = motion_mod.defeaturize(f, "3D")
        np.testing.assert_array_equal(np.asarray(aa).reshape(2, 5, -1),
                                      np.asarray(m[..., :-3]))
        np.testing.assert_array_equal(np.asarray(tr), np.asarray(m[..., -3:]))

    def test_3d_skip_trans(self):
        m = jnp.asarray(np.random.default_rng(3).normal(size=(2, 5, 168)), jnp.float32)
        f = motion_mod.featurize(m, "3D", skip_trans=True)
        assert f.shape == (2, 5, 165)
        aa, tr = motion_mod.defeaturize(f, "3D", skip_trans=True)
        assert aa.shape == (2, 5, 55, 3)
        np.testing.assert_array_equal(np.asarray(tr), 0.0)  # never modelled

    def test_skip_trans_with_6d_rejected(self):
        m = jnp.zeros((1, 2, 168))
        with pytest.raises(ValueError, match="3D"):
            motion_mod.featurize(m, "6D", skip_trans=True)

    def test_unknown_rep_rejected(self):
        with pytest.raises(ValueError, match="smplx_rep"):
            motion_mod.featurize(jnp.zeros((1, 2, 168)), "9D")


class TestTrainStep3D:
    @pytest.mark.parametrize("skip_trans,nfeats", [(False, 168), (True, 165)])
    def test_step_runs_and_learns(self, skip_trans, nfeats):
        cfg = gesture.GestureTrainConfig(
            num_inference_steps=3, vtex_displacement=False,
            smplx_rep="3D", skip_trans=skip_trans,
        )
        pc = prior_cfg(nfeats)
        state = gesture.init_state(jax.random.key(0), pc, DEN, cfg)
        step = gesture.make_train_step(pc, DEN, cfg, None, with_monitor=True)
        batch = tiny_batch()
        rec, inst = [], []
        for i in range(30):
            state, logs = step(state, batch, jax.random.key(i))
            rec.append(float(logs["recons_feature"]))
            inst.append(float(logs["inst_loss"]))
        assert all(np.isfinite(rec)) and all(np.isfinite(inst))
        # Assert learning on the reconstruction leg only: at 30 tiny steps
        # the inst (diffusion) leg's per-step value is dominated by the
        # uniform timestep draw (measured spread ~1.5-2.5 with no trend at
        # this scale), so rec+inst can rise while the model is learning.
        # Mean-of-5 windows ride out dropout noise on the rec leg.
        assert np.mean(rec[-5:]) < np.mean(rec[:5]), (rec, inst)

    def test_vertex_monitor_3d_equals_6d_reference_values(self):
        # the monitor converts 3D features back to 6D+trans; on the SAME
        # ground-truth motion its vertex values must equal the 6D-rep path's
        model = smplx_mod.make_test_model(num_vertices=20, num_joints=55)
        soc = smplx_mod.prepare_soc(model)
        m = tiny_batch()["motion"]
        betas = jnp.zeros((2, 8))
        v6 = smplx_mod.soc_monitor_vertices(
            model, soc, motion_mod.featurize(m, "6D"), betas
        )
        f3 = motion_mod.featurize(m, "3D")
        aa, tr = motion_mod.defeaturize(f3, "3D")
        m6 = motion_mod.axis_angle_to_feats6d(
            jnp.concatenate([aa.reshape(aa.shape[:-2] + (-1,)), tr], -1)
        )
        v3 = smplx_mod.soc_monitor_vertices(model, soc, m6, betas)
        np.testing.assert_allclose(np.asarray(v3), np.asarray(v6), atol=1e-6)


class TestPipeline3D:
    def test_decode_and_encode_round_trip_shapes(self):
        from amuse_tpu.infer.pipeline import GesturePipeline, init_random_params
        from amuse_tpu.models.ast import ASTConfig

        ast_cfg = ASTConfig(embed_dim=16, depth=1, num_heads=2, feature_dim=12)
        pc = prior_cfg(168)
        dc = DenoiserConfig(latent_dim=16, ff_size=32, num_layers=3,
                            num_heads=2, cond_dim=12)
        params = init_random_params(0, pc, dc, ast_cfg, jnp.float32)
        pipe = GesturePipeline(params, pc, dc, ast_cfg, jnp.float32,
                               num_inference_steps=2, smplx_rep="3D")
        m = tiny_batch()["motion"]
        feats = pipe.motion_feats(m)
        assert feats.shape == (2, 12, 168)
        z = pipe.encode_motion(jax.random.key(0), feats)
        poses, trans = pipe.decode_motion(z)
        assert poses.shape == (2, 12, 55, 3)
        assert trans.shape == (2, 12, 3)


class TestCliValidation:
    def _cfg(self, **gesture_over):
        from amuse_tpu.cli.config import load_config

        return load_config(None, {"gesture": gesture_over})

    def test_skip_trans_requires_3d(self):
        from amuse_tpu.cli.main import _model_cfgs

        with pytest.raises(ValueError, match="skip_trans"):
            _model_cfgs(self._cfg(skip_trans=True))

    def test_train_upper_body_refused(self):
        from amuse_tpu.cli.main import _model_cfgs

        with pytest.raises(NotImplementedError, match="train_upper_body"):
            _model_cfgs(self._cfg(train_upper_body=True))

    def test_bad_rep_rejected(self):
        from amuse_tpu.cli.main import _model_cfgs

        with pytest.raises(ValueError, match="smplx_rep"):
            _model_cfgs(self._cfg(smplx_rep="4D"))

    def test_3d_nfeats(self):
        from amuse_tpu.cli.main import _model_cfgs

        pc, _, _ = _model_cfgs(self._cfg(smplx_rep="3D"))
        assert pc.nfeats == 168
        pc, _, _ = _model_cfgs(self._cfg(smplx_rep="3D", skip_trans=True))
        assert pc.nfeats == 165


class TestSchedulerValidation:
    def test_too_many_inference_steps_rejected(self):
        from amuse_tpu.diffusion.schedulers import ddim_timesteps, make_schedule

        sched = make_schedule()
        with pytest.raises(ValueError, match="num_inference_steps"):
            ddim_timesteps(sched, sched.num_train_timesteps + 1)

    def test_equal_steps_with_offset_rejected(self):
        from amuse_tpu.diffusion.schedulers import ddim_timesteps, make_schedule

        sched = make_schedule()
        with pytest.raises(ValueError, match="steps_offset"):
            ddim_timesteps(sched, sched.num_train_timesteps)
