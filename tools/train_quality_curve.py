"""Train -> quality: prove the metric pipeline detects learning.

Round-3 verdict item 6: the eval stack (external FGD embedder + runner) had
only ever been shown to RUN, never to move the right way during training.
This tool executes the full loop on a synthetic BEAT tree and commits the
curve as an artifact (TRAINQUALITY_r{N}.json):

  synth tree -> prepare_data -> train_audio (stage-1 AST checkpoint) ->
  train_embedder (GT windows only) -> train_gesture in K-epoch legs,
  evaluating fgd / fgd_embedder against the GT cache after each leg
  (pipeline rebuilt from the orbax checkpoints exactly as eval_gesture
  does, via AMUSE_TPU_CKPT / AMUSE_TPU_AST_CKPT).

Pass criterion (round 5, hardened per the round-4 verdict): at EVERY
training seed the fgd_embedder curve falls, AND every trained endpoint
lands strictly below the best score any fresh random-weights generator
achieves (the negative control: repeated evaluation of untrained
generators must not show the descent, or the metric pipeline - not
learning - would be producing it).

Tiny dims (the test-suite configs) so the loop is CPU-feasible; the metric
question - does the pipeline detect learning - is dimension-independent.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python tools/train_quality_curve.py --out TRAINQUALITY_r04.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# force the virtual CPU mesh BEFORE any jax use: the dev/CI sitecustomize
# imports jax at interpreter start with JAX_PLATFORMS pointing at the
# tunnelled TPU, so the env var alone is too late (same as tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()


def build_tree(root: Path) -> None:
    import numpy as np

    from amuse_tpu.audio.wavio import save_wav

    rng = np.random.default_rng(0)
    (root / "mosh").mkdir(parents=True, exist_ok=True)
    # 3 train-split actors x both neutral takes x 4 chunks -> 12 stage-1
    # quads (>= the 8-device mesh's minimum batch) + 36 stage-2 windows
    for aid, name in [(1, "wayne"), (2, "scott"), (9, "miranda")]:
        d = root / "beat" / str(aid)
        d.mkdir(parents=True, exist_ok=True)
        for take, secs in [("0_9_9", 4), ("0_10_10", 4)]:
            stem = f"{aid}_{name}_{take}"
            save_wav(
                d / f"{stem}.wav",
                rng.normal(scale=0.05, size=secs * 160000).astype(np.float32),
            )
            (d / f"{stem}.csv").write_text("0,0\n1,0\n")
            frames = secs * 300
            np.savez(
                root / "mosh" / f"{stem}.npz",
                poses=(0.2 * rng.normal(size=(frames, 165))).astype(np.float32),
                trans=(0.1 * rng.normal(size=(frames, 3))).astype(np.float32),
            )


CFG = {
    "audio": {"ast_embed_dim": 16, "ast_depth": 1, "ast_heads": 2,
              "ast_feature_dim": 12, "epochs": 2},
    "gesture": {"latent_dim": 16, "ff_size": 32, "num_layers": 3,
                "num_heads": 2, "cond_dim": 12, "num_inference_steps": 3,
                "batch_size": 8, "vtex_displacement": False,
                "model_save_freq": 5, "learning_rate": 3e-4},
    "embedder": {"epochs": 60},
    "dtype": "float32",
}


def newest_run(out_dir: Path) -> Path:
    runs = sorted(p for p in out_dir.iterdir() if p.is_dir())
    return runs[-1]


def run_trained_curve(work, cfg, cache, embedder, legs, epochs_per_leg, seed):
    """One training curve at the given seed: K legs, eval after each."""
    import dataclasses

    from amuse_tpu.cli.main import TASKS, _make_pipeline
    from amuse_tpu.eval.runner import evaluate_cache

    cfg = dataclasses.replace(cfg, seed=seed)
    curve = []
    ckpt_dir = None
    for leg in range(legs):
        epochs = (leg + 1) * epochs_per_leg
        leg_cfg = dataclasses.replace(
            cfg,
            gesture=dataclasses.replace(cfg.gesture, epochs=epochs),
            resume=str(ckpt_dir) if ckpt_dir else "",
        )
        t0 = time.time()
        TASKS["train_gesture"](leg_cfg)
        run = newest_run(work / "runs")
        ckpt_dir = run / "checkpoints"
        os.environ["AMUSE_TPU_CKPT"] = str(ckpt_dir)
        pipe = _make_pipeline(cfg)
        res = evaluate_cache(pipe, cache, batch_size=8, seed=cfg.seed,
                             embedder=embedder)
        point = {
            "epoch": epochs,
            "fgd": res["fgd"],
            "fgd_embedder": res["fgd_embedder"],
            "diversity_gen": res["diversity_gen"],
            "leg_seconds": round(time.time() - t0, 1),
        }
        curve.append(point)
        print(f"[curve seed={seed}] {json.dumps(point)}", flush=True)
    return curve


def run_control_curve(work, cfg, cache, embedder, points):
    """NEGATIVE CONTROL (round-4 verdict item 5): a sequence of FRESH
    random-weight generators, one eval per point.

    If fgd_embedder fell merely from repeated evaluation / checkpoint
    cycling rather than from learning, it would fall here too; untrained
    generators must hover at high fgd_embedder with no systematic descent.
    """
    import jax.numpy as jnp

    from amuse_tpu.cli.main import _model_cfgs
    from amuse_tpu.eval.runner import evaluate_cache
    from amuse_tpu.infer.pipeline import GesturePipeline, init_random_params

    prior_cfg, den_cfg, ast_cfg = _model_cfgs(cfg)
    curve = []
    for i in range(points):
        params = init_random_params(1000 + i, prior_cfg, den_cfg, ast_cfg,
                                    jnp.float32)
        pipe = GesturePipeline(
            params, prior_cfg, den_cfg, ast_cfg, jnp.float32,
            num_inference_steps=cfg.gesture.num_inference_steps,
            frame_based_feats=cfg.audio.frame_based_feats,
            smplx_rep=cfg.gesture.smplx_rep,
            skip_trans=cfg.gesture.skip_trans,
        )
        res = evaluate_cache(pipe, cache, batch_size=8, seed=cfg.seed,
                             embedder=embedder)
        point = {
            "init_seed": 1000 + i,
            "fgd": res["fgd"],
            "fgd_embedder": res["fgd_embedder"],
        }
        curve.append(point)
        print(f"[control] {json.dumps(point)}", flush=True)
    return curve


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="TRAINQUALITY_r05.json")
    ap.add_argument("--legs", type=int, default=6, help="eval points")
    ap.add_argument("--epochs-per-leg", type=int, default=15)
    ap.add_argument("--seeds", default="0,1",
                    help="comma-separated training seeds (>=2 for the "
                         "round-5 robustness criterion)")
    ap.add_argument("--control-points", type=int, default=4)
    ap.add_argument("--workdir", default="")
    args = ap.parse_args(argv)

    work = Path(args.workdir) if args.workdir else Path(tempfile.mkdtemp(prefix="amuse_curve_"))
    work.mkdir(parents=True, exist_ok=True)
    os.chdir(work)
    build_tree(work)

    cfg_json = dict(
        CFG,
        data={
            "data_root": "beat", "mosh_root": "mosh", "cache_dir": "cache",
            "stage1_dataset": "stage1.npz", "smplx_model_dir": "nonexistent",
        },
        out_dir="runs",
    )
    cfg_path = work / "curve.json"
    cfg_path.write_text(json.dumps(cfg_json))

    from amuse_tpu.cli.config import load_config
    from amuse_tpu.cli.main import TASKS

    cfg = load_config(str(cfg_path), {})
    t0 = time.time()
    TASKS["prepare_data"](cfg)
    print(f"[curve] prepare_data done ({time.time() - t0:.0f}s)", flush=True)

    # stage-1 AST checkpoint (tiny dims): the eval pipeline needs one to
    # assemble pipeline params from orbax checkpoints
    TASKS["train_audio"](cfg)
    ast_ckpt = newest_run(work / "runs") / "checkpoints"
    assert ast_ckpt.exists(), ast_ckpt
    os.environ["AMUSE_TPU_AST_CKPT"] = str(ast_ckpt)
    print(f"[curve] stage-1 checkpoint: {ast_ckpt}", flush=True)

    # external FGD embedder trained on GT windows only
    TASKS["train_embedder"](cfg)
    emb_path = newest_run(work / "runs") / "embedder.npz"
    assert emb_path.exists(), emb_path

    from amuse_tpu.core import motion as motion_mod  # noqa: F401 (warm import)
    from amuse_tpu.data.cache import WindowCache
    from amuse_tpu.eval import embedder as emb_mod

    embedder = emb_mod.load(emb_path)
    cache = WindowCache(work / "cache")

    seeds = [int(s) for s in args.seeds.split(",") if s != ""]
    curves = {
        str(seed): run_trained_curve(
            work, cfg, cache, embedder, args.legs, args.epochs_per_leg, seed
        )
        for seed in seeds
    }
    control = run_control_curve(work, cfg, cache, embedder,
                                args.control_points)

    per_seed = {
        s: {
            "fgd_embedder_first": c[0]["fgd_embedder"],
            "fgd_embedder_last": c[-1]["fgd_embedder"],
            "falls": c[-1]["fgd_embedder"] < c[0]["fgd_embedder"],
        }
        for s, c in curves.items()
    }
    control_min = min(p["fgd_embedder"] for p in control)
    control_max = max(p["fgd_embedder"] for p in control)
    # learning is detected iff EVERY seed's curve falls AND every trained
    # endpoint lands strictly below the best any untrained generator ever
    # scored (the negative control keys the claim)
    all_fall = all(v["falls"] for v in per_seed.values())
    below_control = all(
        v["fgd_embedder_last"] < control_min for v in per_seed.values()
    )
    report = {
        "what": "fgd/fgd_embedder vs training epoch on the synthetic BEAT "
        "tree (tiny dims), at multiple seeds, against a random-weights "
        "negative control: evidence the metric pipeline detects learning "
        "and does not manufacture descents",
        "embedder_provenance": embedder[2],
        "num_gt_windows": len(cache),
        "seeds": seeds,
        "curves": curves,
        "per_seed": per_seed,
        "control_curve": control,
        "control_fgd_embedder_min": control_min,
        "control_fgd_embedder_max": control_max,
        "all_seeds_fall": all_fall,
        "trained_below_all_controls": below_control,
        "learning_detected": all_fall and below_control,
    }
    out = REPO / args.out if not Path(args.out).is_absolute() else Path(args.out)
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps({k: report[k] for k in
                      ("per_seed", "control_fgd_embedder_min",
                       "all_seeds_fall", "trained_below_all_controls",
                       "learning_detected")}))
    return 0 if report["learning_detected"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
