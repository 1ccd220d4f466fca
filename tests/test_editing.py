"""Editing-task semantics tests (style transfer quirk, xemo swap pairing,
content control) with a tiny pipeline."""

import jax.numpy as jnp
import numpy as np
import pytest

from amuse_tpu.infer.editing import (
    TakeLatents,
    content_control,
    style_transfer,
    style_xemo_transfer,
)
from amuse_tpu.infer.pipeline import GesturePipeline, init_random_params
from amuse_tpu.models.ast import ASTConfig
from amuse_tpu.models.denoiser import DenoiserConfig
from amuse_tpu.models.vae import PriorConfig

PRIOR = PriorConfig(nfeats=333, latent_dim=16, ff_size=32, num_layers=3, num_heads=2, window=12)
DEN = DenoiserConfig(latent_dim=16, ff_size=32, num_layers=3, num_heads=2, cond_dim=8)
AST = ASTConfig(embed_dim=16, depth=1, num_heads=2, feature_dim=8)


@pytest.fixture(scope="module")
def pipe():
    params = init_random_params(0, PRIOR, DEN, AST, dtype=jnp.float32)
    return GesturePipeline(params, PRIOR, DEN, AST, dtype=jnp.float32, num_inference_steps=2)


def mk_take(actor, take, emo_label, seed):
    rng = np.random.default_rng(seed)
    return TakeLatents(
        actor, take, emo_label,
        rng.normal(size=(1, 8)).astype(np.float32),
        rng.normal(size=(1, 8)).astype(np.float32),
        rng.normal(size=(1, 8)).astype(np.float32),
    )


class TestStyleTransfer:
    def test_quirk_mode_crosswise_assignment(self, pipe):
        a1 = [mk_take("scott", "0_65_65", 1, 1), mk_take("scott", "0_66_66", 1, 2)]
        a2 = [mk_take("miranda", "0_65_65", 1, 3), mk_take("miranda", "0_66_66", 1, 4)]
        out_quirk = style_transfer(pipe, a1, a2, reference_quirk=True)
        out_straight = style_transfer(pipe, a1, a2, reference_quirk=False)
        assert set(out_quirk) == {
            "scott_0_65_65", "scott_0_66_66", "miranda_0_65_65", "miranda_0_66_66"
        }
        # the two swap conventions must produce different motion
        q = out_quirk["scott_0_65_65"]["sty_miranda"][0]
        s = out_straight["scott_0_65_65"]["sty_miranda"][0]
        assert not np.allclose(q, s)
        # self generations are identical across modes
        np.testing.assert_array_equal(
            out_quirk["scott_0_65_65"]["self"][0],
            out_straight["scott_0_65_65"]["self"][0],
        )

    def test_xemo_diagonal_pairing(self, pipe):
        a1_e1 = mk_take("scott", "0_73_73", 2, 5)
        a1_e2 = mk_take("scott", "0_65_65", 1, 6)
        a2_e1 = mk_take("miranda", "0_73_73", 2, 7)
        a2_e2 = mk_take("miranda", "0_65_65", 1, 8)
        out = style_xemo_transfer(pipe, a1_e1, a1_e2, a2_e1, a2_e2)
        # a1 take1 receives a2 take2's latents etc. (infer_ldm.py:308-318)
        assert "xfer_miranda_0_65_65" in out["scott_0_73_73"]
        assert "xfer_scott_0_65_65" in out["miranda_0_73_73"]
        assert "xfer_miranda_0_73_73" in out["scott_0_65_65"]
        assert "xfer_scott_0_73_73" in out["miranda_0_65_65"]


class TestContentControl:
    def test_swaps_content_only(self, pipe):
        takes = [mk_take("scott", "0_9_9", 0, 9), mk_take("scott", "0_65_65", 1, 10)]
        out = content_control(pipe, takes)
        r = out["scott_0_9_9"]
        assert set(r) == {"self", "con_0_65_65"}
        assert not np.allclose(r["self"][0], r["con_0_65_65"][0])
