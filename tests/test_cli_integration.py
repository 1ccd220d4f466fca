"""Full CLI integration: prepare_data -> train_gesture -> infer_gesture on a
synthetic BEAT tree with tiny model configs (CPU, 8-device mesh)."""

import numpy as np
import pytest

from amuse_tpu.audio.wavio import save_wav
from amuse_tpu.cli.config import load_config
from amuse_tpu.cli import main as cli

TINY = {
    "audio": {"ast_embed_dim": 16, "ast_depth": 1, "ast_heads": 2, "ast_feature_dim": 12},
    "gesture": {
        "latent_dim": 16, "ff_size": 32, "num_layers": 3, "num_heads": 2,
        "cond_dim": 12, "num_inference_steps": 3, "epochs": 2, "batch_size": 8,
        "vtex_displacement": False,
    },
    "dtype": "float32",
    "debug": True,
}


@pytest.fixture(scope="module")
def beat_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("beat_data")
    data_root = root / "beat"
    mosh_root = root / "mosh"
    mosh_root.mkdir()
    rng = np.random.default_rng(0)
    for actor_id, name in [(2, "scott"), (9, "miranda")]:
        d = data_root / str(actor_id)
        d.mkdir(parents=True)
        stem = f"{actor_id}_{name}_0_9_9"
        # 4 chunks of audio + 4 windows of motion per take
        save_wav(d / f"{stem}.wav", rng.normal(scale=0.05, size=4 * 160000).astype(np.float32))
        (d / f"{stem}.csv").write_text("0,0\n1,0\n")
        np.savez(
            mosh_root / f"{stem}.npz",
            poses=(0.2 * rng.normal(size=(4 * 300, 165))).astype(np.float32),
            trans=(0.1 * rng.normal(size=(4 * 300, 3))).astype(np.float32),
        )
    return root


def make_cfg(beat_tree, workdir):
    overrides = dict(TINY)
    overrides["data"] = {
        "data_root": str(beat_tree / "beat"),
        "mosh_root": str(beat_tree / "mosh"),
        "cache_dir": str(workdir / "cache"),
        "stage1_dataset": str(workdir / "stage1.npz"),
        "smplx_model_dir": str(workdir / "nonexistent"),
    }
    overrides["out_dir"] = str(workdir / "runs")
    return load_config(None, overrides)


@pytest.mark.integration
def test_train_with_native_loader(beat_tree, tmp_path):
    """gesture.native_loader=True routes batches through the C++ ABIN
    prefetch loader (built on demand); one epoch must train with finite
    losses and create the derived train.abin next to the cache."""
    import dataclasses

    from amuse_tpu.native import loader as nl

    if not nl.is_available():
        pytest.skip("g++ unavailable")
    cfg = make_cfg(beat_tree, tmp_path)
    cfg = dataclasses.replace(
        cfg, gesture=dataclasses.replace(cfg.gesture, epochs=1, native_loader=True)
    )
    cli.task_prepare_data(cfg)
    cli.task_train_gesture(cfg)
    assert (tmp_path / "cache" / "train.abin").exists()


@pytest.mark.integration
def test_resume_is_step_identical(beat_tree, tmp_path):
    """A run killed after epoch 1 and resumed (full TrainState: params +
    optimizer moments + step) produces the SAME epoch-2 losses as an
    unkilled 2-epoch run — the reference's wOpt semantics done right."""
    import dataclasses
    import json

    def losses(run_root, epoch):
        log = sorted(run_root.glob("*/metrics.jsonl"))[-1]
        rows = [json.loads(l) for l in log.read_text().splitlines()]
        return {k: v for r in rows if r["step"] == epoch for k, v in r.items()}

    def run(workdir, epochs, resume=""):
        cfg = make_cfg(beat_tree, workdir)
        cfg = dataclasses.replace(
            cfg,
            debug=False,
            resume=resume,
            gesture=dataclasses.replace(
                cfg.gesture, epochs=epochs, model_save_freq=1
            ),
        )
        cli.task_prepare_data(cfg)
        cli.task_train_gesture(cfg)
        return workdir / "runs"

    full = run(tmp_path / "full", 2)
    part = run(tmp_path / "part", 1)
    part_ckpt = sorted(part.glob("*/checkpoints"))[-1]
    resumed = run(tmp_path / "part", 2, resume=str(part_ckpt))

    want, got = losses(full, 1), losses(resumed, 1)
    assert got, "resumed run logged no epoch-2 metrics"
    for k in want:
        if k.startswith("train_"):
            np.testing.assert_allclose(got[k], want[k], rtol=1e-6, err_msg=k)


@pytest.mark.integration
def test_prepare_train_infer(beat_tree, tmp_path):
    cfg = make_cfg(beat_tree, tmp_path)

    # ---- prepare_data: builds the window cache + stage-1 quads
    cli.task_prepare_data(cfg)
    from amuse_tpu.data.cache import WindowCache

    wc = WindowCache(cfg.data.cache_dir)
    assert len(wc) == 8  # 2 takes x 4 windows
    item = wc[0]
    assert item["motion"].shape == (300, 168)
    assert item["con"].shape == (12,)

    # ---- train_gesture: two tiny epochs over the cache
    cli.task_train_gesture(cfg)

    # ---- infer_gesture: generate npz outputs for the synthetic wavs
    wav_dir = str(beat_tree / "beat" / "2")
    cli.task_infer_gesture(cfg, wav_dir)
    runs = sorted((tmp_path / "runs").glob("*/gesture/*/rep*/seq_*/*.npz"))
    assert runs, "no exported npz found"
    d = np.load(runs[0])
    assert d["poses"].shape == (300, 55, 3)
    assert d["trans"].shape == (300, 3)
    # the actor name parsed from the BEAT-style stem drives gender/betas
    assert str(d["gender"]) == "male"  # 2_scott_0_9_9 -> scott


@pytest.mark.integration
def test_edit_gesture_emotion_control(beat_tree, tmp_path, monkeypatch):
    """task_edit_gesture end-to-end: emotion_control over the synthetic tree
    (only the neutral take exists -> one source item, 8 emotion variants)."""
    import dataclasses

    cfg = make_cfg(beat_tree, tmp_path)
    cli.task_prepare_data(cfg)
    cfg = dataclasses.replace(
        cfg, test=dataclasses.replace(cfg.test, emotion_control=True, actors=("scott",))
    )
    monkeypatch.chdir(tmp_path)  # keep the demo-path viz_dump probe local
    cli.task_edit_gesture(cfg)
    outs = sorted((tmp_path / "runs").glob("*/emotion_control/rep0/*/*/seq_*/*.npz"))
    assert outs, "no emotion_control npz exported"
    d = np.load(outs[0])
    assert d["poses"].shape == (300, 55, 3)
    # the tree carries one (neutral) take, so only the take's own generation
    # exists; emotion cross-wiring across takes is covered by test_editing.py
    variants = {p.parent.parent.name for p in outs}
    assert variants == {"self"}, variants


def test_eval_gesture_strict_refuses_rotation_space(beat_tree, tmp_path):
    """test.strict_position_space + no SMPL-X body model -> hard refusal
    BEFORE any model is built (no silent rotation-space 'APE')."""
    import dataclasses

    cfg = make_cfg(beat_tree, tmp_path)  # smplx_model_dir points nowhere
    cfg = dataclasses.replace(
        cfg, test=dataclasses.replace(cfg.test, strict_position_space=True)
    )
    with pytest.raises(SystemExit, match="rotation-space"):
        cli.task_eval_gesture(cfg)
