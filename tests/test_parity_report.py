"""tools/parity_report.py metric gate (reference: infer_ldm.py:75-114 is the
flow the tool replays; the gate is this repo's addition)."""

import importlib.util
import sys
from pathlib import Path

import numpy as np

spec = importlib.util.spec_from_file_location(
    "parity_report", Path(__file__).parent.parent / "tools" / "parity_report.py"
)
pr = importlib.util.module_from_spec(spec)
sys.modules["parity_report"] = pr
spec.loader.exec_module(pr)


def _pair(rng, frames=12):
    poses = rng.normal(size=(frames, 55, 3)).astype(np.float32) * 0.2
    trans = rng.normal(size=(frames, 3)).astype(np.float32) * 0.1
    return poses, trans


class TestMetricDiff:
    def test_identical_passes(self):
        poses, trans = _pair(np.random.default_rng(0))
        rep = pr.metric_diff(poses, trans, poses.copy(), trans.copy(), tol=5e-3)
        assert rep["pass"] is True
        assert rep["pose_max_rad"] == 0.0

    def test_localized_divergence_fails_despite_small_mae(self):
        # round-3 review finding: one joint diverging for a few frames must
        # FAIL even though the error dilutes under tol in the frame average.
        poses, trans = _pair(np.random.default_rng(1), frames=300)
        rp = poses.copy()
        rp[5, 10, 0] += 0.5  # single-element 0.5 rad divergence
        rep = pr.metric_diff(poses, trans, rp, trans.copy(), tol=5e-3)
        assert rep["pose_mae_rad"] <= 5e-3  # diluted: the old gate passed
        assert rep["pose_max_rad"] >= 0.5 - 1e-6
        assert rep["pass"] is False

    def test_translation_max_gated_too(self):
        poses, trans = _pair(np.random.default_rng(2), frames=300)
        rt = trans.copy()
        rt[0, 2] += 0.1  # 10 cm on one frame
        rep = pr.metric_diff(poses, trans, poses.copy(), rt, tol=5e-3)
        assert rep["pass"] is False

    def test_reference_layout_flexible(self):
        # reference npzs may store poses flat (T, 165); reshape must accept it
        poses, trans = _pair(np.random.default_rng(3))
        rep = pr.metric_diff(
            poses, trans, poses.reshape(len(poses), -1), trans.copy(), tol=5e-3
        )
        assert rep["pass"] is True


class TestEditingRehearsal:
    """--wav2 drives the three released editing tasks through the imported
    pipeline and A/Bs them against a reference dir (round-3 verdict item 5:
    the rehearsal must cover the editing swaps, incl. the crosswise
    emo<->sty quirk, before the released checkpoints arrive)."""

    def test_generates_and_self_abs(self, tmp_path):
        import jax.numpy as jnp

        from amuse_tpu.infer.pipeline import GesturePipeline, init_random_params
        from amuse_tpu.models.ast import ASTConfig
        from amuse_tpu.models.denoiser import DenoiserConfig
        from amuse_tpu.models.vae import PriorConfig
        from amuse_tpu.audio.wavio import save_wav

        prior = PriorConfig(nfeats=333, latent_dim=16, ff_size=32,
                            num_layers=3, num_heads=2, window=12)
        den = DenoiserConfig(latent_dim=16, ff_size=32, num_layers=3,
                             num_heads=2, cond_dim=8)
        ast = ASTConfig(embed_dim=16, depth=1, num_heads=2, feature_dim=8)
        pipe = GesturePipeline(
            init_random_params(0, prior, den, ast, dtype=jnp.float32),
            prior, den, ast, dtype=jnp.float32, num_inference_steps=2,
        )
        rng = np.random.default_rng(0)
        w1 = tmp_path / "a1.wav"
        w2 = tmp_path / "a2.wav"
        save_wav(w1, rng.normal(scale=0.05, size=160000).astype(np.float32))
        save_wav(w2, rng.normal(scale=0.05, size=160000).astype(np.float32))

        gen_dir = tmp_path / "gen"
        gen_dir.mkdir()
        rep = pr.editing_rehearsal(pipe, str(w1), str(w2), gen_dir,
                                   seed=0, tol=5e-3, ref_dir="")
        assert set(rep) == {"emotion_control", "style_transfer", "style_Xemo_transfer"}
        npzs = sorted(p.name for p in gen_dir.glob("*.npz"))
        # every task wrote self + edited variants, crosswise quirk included
        assert any("style_transfer__a1_t1__sty_a2" in n for n in npzs)
        assert any("emotion_control__a1_t1__emo_t2" in n for n in npzs)
        assert any("style_Xemo_transfer__a1_t1__xfer_a2_t2" in n for n in npzs)

        # self-A/B: the generated outputs as their own reference must pass,
        # proving the <task>__<take>__<variant>.npz naming contract
        ab_dir = tmp_path / "ab"
        ab_dir.mkdir()
        rep2 = pr.editing_rehearsal(pipe, str(w1), str(w2), ab_dir,
                                    seed=0, tol=5e-3, ref_dir=str(gen_dir))
        for task, entries in rep2.items():
            for stem, diff in entries.items():
                assert diff.get("pass") is True, (task, stem, diff)
