"""Editing eval-set builders: edge cases + replication semantics.

Round-3 verdict item 8: the reference's set builders
(dm/utils/ldm_evals.py:161-248) assume every requested take exists and
KeyError deep inside process_loader otherwise; style_Xemo_transfer_dict
additionally redraws which of an emotion's two takes represents it per
replication (np.random.randint(2), ldm_evals.py:243). These tests pin our
builders' behaviour on missing takes, <2 takes per emotion, and
replication_times>1 driven through the real task_edit_gesture.
"""

import dataclasses
import warnings

import numpy as np
import pytest

from amuse_tpu.audio.wavio import save_wav
from amuse_tpu.data.beat import discover
from amuse_tpu.data.eval_sets import (
    emotion_control_set,
    style_transfer_set,
    style_xemo_set,
)


def build_tree(root, spec):
    """spec: {actor_id_name: [takes]} -> discovered takes list."""
    rng = np.random.default_rng(0)
    mosh = root / "mosh"
    mosh.mkdir(exist_ok=True)
    for (actor_id, name), take_list in spec.items():
        d = root / "beat" / str(actor_id)
        d.mkdir(parents=True, exist_ok=True)
        for take in take_list:
            stem = f"{actor_id}_{name}_{take}"
            save_wav(
                d / f"{stem}.wav",
                rng.normal(scale=0.03, size=170000).astype(np.float32),
            )
            np.savez(
                mosh / f"{stem}.npz",
                poses=rng.normal(size=(310, 165)).astype(np.float32),
                trans=rng.normal(size=(310, 3)).astype(np.float32),
            )
    return discover(root / "beat", mosh)


class TestMissingTakes:
    def test_emotion_control_skips_missing_with_warning(self, tmp_path):
        takes = build_tree(tmp_path, {(2, "scott"): ["0_65_65"]})  # happy only
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            items = emotion_control_set(takes, "scott", ["happy", "angry"])
        assert [i.emotion for i in items] == ["happy"]
        assert any("angry" in str(x.message) for x in w)

    def test_emotion_control_empty_tree(self, tmp_path):
        takes = build_tree(tmp_path, {(2, "scott"): []})
        with warnings.catch_warnings(record=True):
            warnings.simplefilter("ignore")
            assert emotion_control_set(takes, "scott", ["happy"]) == []

    def test_style_transfer_under_two_takes_warns(self, tmp_path):
        # scott has both happy takes, miranda only one -> pairing min is 1
        takes = build_tree(
            tmp_path,
            {(2, "scott"): ["0_65_65", "0_66_66"], (9, "miranda"): ["0_65_65"]},
        )
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            a1, a2 = style_transfer_set(takes, "scott", "miranda", "happy")
        assert (len(a1), len(a2)) == (2, 1)
        assert any("miranda has 1/2" in str(x.message) for x in w)

    def test_style_xemo_missing_corner_raises(self, tmp_path):
        takes = build_tree(tmp_path, {(2, "scott"): ["0_73_73"]})
        with pytest.raises(FileNotFoundError, match="0_65_65 for actor scott"):
            style_xemo_set(takes, "scott", "miranda", "angry", "happy")


class TestXemoReplicationDraw:
    def _takes(self, tmp_path):
        # both actors carry BOTH takes of angry and happy
        spec = {
            (2, "scott"): ["0_73_73", "0_74_74", "0_65_65", "0_66_66"],
            (9, "miranda"): ["0_73_73", "0_74_74", "0_65_65", "0_66_66"],
        }
        return build_tree(tmp_path, spec)

    def test_no_rng_is_deterministic_first_take(self, tmp_path):
        takes = self._takes(tmp_path)
        corners = style_xemo_set(takes, "scott", "miranda", "angry", "happy")
        assert corners["a1_e1"].take == "0_73_73"
        assert corners["a1_e2"].take == "0_65_65"

    def test_rng_draw_covers_both_takes_and_is_seed_stable(self, tmp_path):
        takes = self._takes(tmp_path)
        drawn = set()
        for seed in range(8):
            c = style_xemo_set(
                takes, "scott", "miranda", "angry", "happy",
                rng=np.random.default_rng(seed),
            )
            # both actors share the drawn take per emotion (reference draws
            # once per emotion, not per actor)
            assert c["a1_e1"].take == c["a2_e1"].take
            assert c["a1_e2"].take == c["a2_e2"].take
            drawn.add((c["a1_e1"].take, c["a1_e2"].take))
            again = style_xemo_set(
                takes, "scott", "miranda", "angry", "happy",
                rng=np.random.default_rng(seed),
            )
            assert again["a1_e1"].take == c["a1_e1"].take
        # across 8 seeds the randint(2) draw must have hit both angry takes
        assert {t[0] for t in drawn} == {"0_73_73", "0_74_74"}


@pytest.mark.integration
def test_edit_gesture_replication_times(tmp_path, monkeypatch):
    """replication_times=2 through the real task (trainer.py:550 semantics):
    rep0/rep1 both export, with different seeds -> different generations."""
    from tests.test_cli_integration import TINY
    from amuse_tpu.cli import main as cli
    from amuse_tpu.cli.config import load_config

    takes_tree = tmp_path / "data"
    takes_tree.mkdir()
    build_tree(takes_tree, {(2, "scott"): ["0_9_9"]})  # one neutral take
    overrides = dict(TINY)
    overrides["data"] = {
        "data_root": str(takes_tree / "beat"),
        "mosh_root": str(takes_tree / "mosh"),
        "cache_dir": str(tmp_path / "cache"),
        "stage1_dataset": str(tmp_path / "stage1.npz"),
        "smplx_model_dir": str(tmp_path / "nonexistent"),
    }
    overrides["out_dir"] = str(tmp_path / "runs")
    cfg = load_config(None, overrides)
    cfg = dataclasses.replace(
        cfg,
        test=dataclasses.replace(
            cfg.test, emotion_control=True, actors=("scott",), replication_times=2
        ),
    )
    monkeypatch.chdir(tmp_path)
    cli.task_edit_gesture(cfg)
    run = sorted((tmp_path / "runs").glob("*/emotion_control"))[-1]
    rep_dirs = sorted(p.name for p in run.iterdir())
    assert rep_dirs == ["rep0", "rep1"]
    out0 = sorted(run.glob("rep0/*/self/seq_*/*.npz"))
    out1 = sorted(run.glob("rep1/*/self/seq_*/*.npz"))
    assert out0 and len(out0) == len(out1)
    p0 = np.load(out0[0])["poses"]
    p1 = np.load(out1[0])["poses"]
    assert p0.shape == p1.shape
    # per-rep seed changes the DDIM init latents -> different generations
    assert not np.allclose(p0, p1)
