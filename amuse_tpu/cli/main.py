"""CLI entry point: the six reference tasks, TPU-native.

``python -m amuse_tpu.cli.main --fn {train_audio, train_gesture,
infer_gesture, edit_gesture, prepare_data, bvh2smplx_}`` mirrors the
reference task surface (scripts/main.py:237-243) over this framework's
config system (immutable; overrides via repeated ``--set key=value``).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def _model_cfgs(cfg):
    """Config dataclasses -> model config objects shared by all tasks."""
    from amuse_tpu.models.ast import ASTConfig
    from amuse_tpu.models.denoiser import DenoiserConfig
    from amuse_tpu.models.vae import PriorConfig

    g, a = cfg.gesture, cfg.audio
    if g.smplx_rep not in ("6D", "3D"):
        raise ValueError(f"gesture.smplx_rep must be '6D' or '3D', got {g.smplx_rep!r}")
    if g.skip_trans and g.smplx_rep != "3D":
        # reference denoiser.py:26-27 asserts skip_trans is 3D-only
        raise ValueError("gesture.skip_trans requires gesture.smplx_rep='3D'")
    if g.train_upper_body:
        # 3D-only upstream (denoiser.py:31), and its joint-drop reshape
        # (trainer.py:378-380: (j c)-flattened poses viewed as (3, 55) and
        # column-indexed) scrambles joints rather than selecting them - a
        # dead/broken reference path we refuse rather than reproduce.
        raise NotImplementedError(
            "gesture.train_upper_body reproduces a broken reference path "
            "(trainer.py:378-380 misindexes the flattened joint axis); "
            "train with smplx_rep='3D' instead"
        )
    nfeats = 333 if g.smplx_rep == "6D" else 168
    if g.skip_trans:
        nfeats -= 3
    prior_cfg = PriorConfig(
        nfeats=nfeats, latent_dim=g.latent_dim, ff_size=g.ff_size,
        num_layers=g.num_layers, num_heads=g.num_heads, dropout=g.dropout,
        window=cfg.data.window_frames,
    )
    den_cfg = DenoiserConfig(
        latent_dim=g.latent_dim, ff_size=g.ff_size, num_layers=g.num_layers,
        num_heads=g.num_heads, dropout=g.dropout, cond_dim=g.cond_dim,
    )
    ast_cfg = ASTConfig(
        input_tdim=a.target_length, input_fdim=a.num_mel_bins,
        embed_dim=a.ast_embed_dim, depth=a.ast_depth, num_heads=a.ast_heads,
        feature_dim=a.ast_feature_dim, gelu_tanh=a.gelu_tanh,
    )
    return prior_cfg, den_cfg, ast_cfg


def _make_pipeline(cfg):
    import jax.numpy as jnp

    from amuse_tpu.infer.pipeline import GesturePipeline, init_random_params
    from amuse_tpu.utils.checkpoint_io import load_pipeline_params

    prior_cfg, den_cfg, ast_cfg = _model_cfgs(cfg)
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    params = load_pipeline_params(cfg)
    if params is None:
        print("[pipeline] no checkpoint configured; using random weights")
        params = init_random_params(cfg.seed, prior_cfg, den_cfg, ast_cfg, dtype)
    return GesturePipeline(
        params, prior_cfg, den_cfg, ast_cfg, dtype,
        num_inference_steps=cfg.gesture.num_inference_steps,
        frame_based_feats=cfg.audio.frame_based_feats,
        smplx_rep=cfg.gesture.smplx_rep,
        skip_trans=cfg.gesture.skip_trans,
    )


def _setup(cfg):
    import jax

    from amuse_tpu.utils.logging import RunLogger

    run_dir = Path(cfg.out_dir) / time.strftime("%Y%m%d-%H%M%S")
    if not cfg.debug:
        run_dir.mkdir(parents=True, exist_ok=True)
        from amuse_tpu.cli.config import dump_config

        (run_dir / "experiment_args.json").write_text(dump_config(cfg))
    logger = RunLogger(run_dir if not cfg.debug else None)
    return run_dir, logger, jax.random.key(cfg.seed)


def task_prepare_data(cfg):
    """Stage-2 cache build: MoSh npz + frozen AST features -> window shards
    (reference: main.py:118-122 -> dm.latent_diffusion_dm_v2)."""
    from amuse_tpu.data import beat, cache

    import numpy as np

    from amuse_tpu.parallel import batch_sharding, make_mesh

    takes = beat.discover(Path(cfg.data.data_root), Path(cfg.data.mosh_root))
    subset = beat.stage2_subset(takes)
    print(f"[prepare_data] {len(subset)} stage-2 takes discovered")
    if not takes:
        print(f"[prepare_data] WARNING: nothing under {cfg.data.data_root} - "
              "check data.data_root/data.mosh_root; not writing empty datasets")
        return
    mesh = make_mesh()
    if not subset:
        # a poisoned 0-window manifest would short-circuit every future
        # build (the cache is skip-if-built); don't write one. An
        # audio-only corpus (wavs + emotion CSVs, no MoSh) is still a
        # valid stage-1 corpus, so fall through to the quad build below.
        print(f"[prepare_data] WARNING: takes found but no stage-2 subset - "
              f"check data.mosh_root ({cfg.data.mosh_root}); stage-2 cache "
              "not built (stage-1 dataset still builds)")
    else:
        _build_stage2(cfg, subset, mesh)

    # stage-1 quad dataset (skip-if-built like the stage-2 cache - the
    # fbank pass is the expensive leg at BEAT scale, and the reference
    # skips its prebuilt fbank npz the same way, dm/dm.py:413-415)
    from amuse_tpu.data import stage1

    out = Path(cfg.data.stage1_dataset)
    provenance = stage1.takes_provenance(takes)
    if stage1.dataset_is_current(out, provenance):
        print(f"[prepare_data] stage-1 dataset current, skipping -> {out} "
              "(identity-only check: delete the npz to force a rebuild "
              "after editing a wav/CSV in place)")
        return

    # the fbank pass is the expensive stage-1 leg at BEAT scale (1,941
    # takes); shard it over the mesh data axis exactly like the stage-2
    # AST pass (shard_map: per-chunk-independent front-end, no
    # collectives; tests/test_stage1_dataset.py pins sharded == default)
    from amuse_tpu.audio import fbank as fb

    per_take = stage1.fbanks_per_take(takes, fbank_fn=fb.make_sharded_fbank(mesh))
    train = stage1.build_quads(per_take, "train")
    val = stage1.build_quads(per_take, "val")
    out.parent.mkdir(parents=True, exist_ok=True)
    stage1.save_dataset(out, train, val, provenance)
    print(
        f"[prepare_data] stage-1 quads: train {train['emo_id'].shape[0]}, "
        f"val {val['emo_id'].shape[0]} -> {out}"
    )


def _build_stage2(cfg, subset, mesh):
    """The stage-2 window-cache leg of prepare_data (frozen-AST features)."""
    import numpy as np

    from amuse_tpu.data import cache
    from amuse_tpu.parallel import batch_sharding

    pipe = _make_pipeline(cfg)
    n_dev = mesh.devices.size
    sharding = batch_sharding(mesh)

    import jax
    from jax.sharding import PartitionSpec as P

    # shard_map (not plain jit-with-shardings): each device runs the frozen
    # AST on its LOCAL chunk shard - the Pallas attention kernel inside has
    # no GSPMD partitioning rule, so auto-sharding would all-gather and
    # replicate it (BASELINE.json's ICI regen target would be lost)
    sharded_encode = jax.jit(
        jax.shard_map(
            pipe.encode_audio_fn,
            mesh=mesh,
            in_specs=(P(), P("data")),
            out_specs=P("data"),
        )
    )

    def encode_sharded(chunks):
        """Pad the chunk batch to the device count and shard the AST pass
        over the mesh data axis (BASELINE.json's ICI regen target)."""
        n = chunks.shape[0]
        pad = (-n) % n_dev
        if pad:
            chunks = np.concatenate([chunks, np.zeros((pad,) + chunks.shape[1:], chunks.dtype)])
        with mesh:
            out = sharded_encode(pipe.params, jax.device_put(chunks, sharding))
        return {k: np.asarray(v)[:n] for k, v in out.items()}

    import os

    ast_source = os.environ.get("AMUSE_TPU_CKPT") or "random-weights"
    if ast_source == "random-weights":
        print("[prepare_data] WARNING: building AST features with RANDOM "
              "weights (set AMUSE_TPU_CKPT for real conditioning)")
    cache.build_stage2_cache(
        subset, Path(cfg.data.cache_dir), encode_sharded,
        window_frames=cfg.data.window_frames, ast_source=ast_source,
    )


def task_train_audio(cfg):
    """Stage-1 AST disentangler training (reference: trainer.train_dtw_ast)."""
    import jax
    import numpy as np

    from amuse_tpu.data import stage1
    from amuse_tpu.parallel import make_mesh, replicate, shard_batch
    from amuse_tpu.train import audio as ta
    from amuse_tpu.train.checkpoint import CheckpointManager

    run_dir, logger, key = _setup(cfg)
    tcfg = ta.AudioTrainConfig(
        learning_rate=cfg.audio.learning_rate,
        weight_decay=cfg.audio.weight_decay,
        beta1=cfg.audio.beta1,
        beta2=cfg.audio.beta2,
        lr_decay_start_epoch=cfg.audio.lr_decay_start_epoch,
        lr_decay_gamma=cfg.audio.lr_decay_gamma,
        epochs=cfg.audio.epochs,
        frame_based_feats=cfg.audio.frame_based_feats,
        freq_mask=cfg.audio.freq_mask,
        time_mask=cfg.audio.time_mask,
        noise_aug=cfg.audio.noise,
    )
    train, val = stage1.load_dataset(Path(cfg.data.stage1_dataset))
    mesh = make_mesh()
    # the SAME ast_cfg/dtype the inference pipeline will rebuild from cfg
    # (_model_cfgs) - otherwise audio.ast_* / dtype overrides would train a
    # different architecture than the checkpoint loader expects
    _, _, ast_cfg = _model_cfgs(cfg)
    import jax.numpy as jnp

    train_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    # no-remat is fastest at the reference batch (1-2 quads/device: 157 ms
    # vs 182 with remat on v5e) but the stored ViT activations OOM a 16 GB
    # chip from ~3-4 quads/device - flip remat on automatically there
    import dataclasses

    quads_per_device = max(1, cfg.audio.batch_size // mesh.devices.size)
    if quads_per_device >= 3 and not ast_cfg.remat:
        ast_cfg = dataclasses.replace(ast_cfg, remat=True)
        print(f"[AST-T] {quads_per_device} quads/device: remat enabled "
              "(no-remat activations exceed 16 GB HBM from ~3 quads)")
    step_fn, set_lr = ta.make_train_step(tcfg, train_dtype, ast_cfg)
    state = ta.init_state(key, tcfg, train_dtype, ast_cfg)
    start_epoch = 0
    if cfg.resume:
        from amuse_tpu.train.checkpoint import restore_train_state

        state, start_epoch = restore_train_state(cfg.resume, state, "AST-T")
    state = replicate(mesh, state)
    ckpt = CheckpointManager(run_dir / "checkpoints") if not cfg.debug else None
    n_dev = mesh.devices.size
    # round UP to a device multiple: P("data") device_put raises when the
    # leading dim is not divisible by the data-axis size
    bsz = -(-max(cfg.audio.batch_size, n_dev) // n_dev) * n_dev
    n_train = int(train["emo_id"].shape[0])
    if n_train < bsz:
        # a dataset smaller than one batch would yield ZERO steps per epoch
        # and silently checkpoint random weights; clamp to the largest
        # device multiple, or fail loud if even that is impossible
        clamped = (n_train // n_dev) * n_dev
        if clamped == 0:
            raise RuntimeError(
                f"stage-1 dataset has {n_train} quads but the {n_dev}-device "
                f"mesh needs at least {n_dev} per batch - nothing would train"
            )
        print(f"[AST-T] batch {bsz} > dataset {n_train}; clamped to {clamped}")
        bsz = clamped

    from amuse_tpu.eval.classification import epoch_stats
    from amuse_tpu.models.ast import ASTDisentangler

    model = ASTDisentangler(dtype=train_dtype, base_cfg=ast_cfg)
    # jitted: eager flax apply is per-primitive dispatch - pathological
    # through the remote-compile tunnel (same reason all inits are jitted)
    encode_jit = jax.jit(
        lambda p, quad: model.apply(
            {"params": p}, quad, tcfg.frame_based_feats, True, method="encode"
        )
    )

    def validate(params):
        """Collect emotion/style logits over the val quads -> stats dict
        (the reference's calculate_stats pass, AST_EVP.py:331-430)."""
        if val["emo_id"].shape[0] == 0:
            return {}
        # a val split smaller than the device-inflated batch must still
        # produce stats (stage1.batches drops the remainder)
        vbsz = min(bsz, int(val["emo_id"].shape[0]))
        emo_logits, sty_logits, emo_lab, sty_lab = [], [], [], []
        for batch in stage1.batches(val, vbsz):
            quad = batch["fbanks"].reshape(-1, *batch["fbanks"].shape[2:])
            enc = encode_jit(params, jnp.asarray(quad))
            emo_logits.append(np.asarray(enc["emo"]["logits"]))
            sty_logits.append(np.asarray(enc["sty"]["logits"]))
            # (B, 4, ...) flattens batch-major: labels repeat 4x per sample
            emo_lab.append(np.repeat(batch["emo_id"], 4))
            labs = np.stack(
                [batch["a1_id"], batch["a1_id"], batch["a2_id"], batch["a2_id"]], axis=1
            )
            sty_lab.append(labs.reshape(-1))
        stats = epoch_stats(
            jnp.asarray(np.concatenate(emo_logits)),
            jnp.asarray(np.concatenate(emo_lab)),
            jnp.asarray(np.concatenate(sty_logits)),
            jnp.asarray(np.concatenate(sty_lab)),
        )
        return {
            "val_emo_acc": stats["emo_stats"]["acc"],
            "val_sty_acc": stats["subject_stats"]["acc"],
            "val_emo_f1": stats["emo_stats"]["f1_micro"],
        }

    with mesh:
        for epoch in range(start_epoch, tcfg.epochs):
            state = set_lr(state, epoch)
            t0, logs = time.time(), {}
            # epoch-keyed shuffle rng: a killed-and-resumed run sees the
            # exact batch order an unkilled run would (resume parity test)
            rng = np.random.default_rng([cfg.seed, epoch])
            for i, batch in enumerate(stage1.batches(train, bsz, rng)):
                batch = shard_batch(mesh, batch)
                # fold epoch and step SEPARATELY: epoch*K+i collides across
                # epochs once an epoch exceeds K steps, replaying identical
                # augmentation/noise draws
                step_key = jax.random.fold_in(jax.random.fold_in(key, epoch), i)
                state, logs = step_fn(state, batch, step_key)
            metrics = {f"train_{k}": float(v) for k, v in logs.items()}
            metrics.update(validate(state.params))
            logger.log(epoch, metrics)
            print(f"[AST-T] epoch {epoch + 1}/{tcfg.epochs} ({time.time() - t0:.1f}s): "
                  + ", ".join(f"{k}={float(v):.4f}" for k, v in metrics.items()))
            if ckpt:
                # full state (params + optimizer moments + step): the
                # reference's wOpt semantics (trainer.py:468-496)
                ckpt.save(epoch + 1, state, metrics)


def task_train_gesture(cfg):
    """Stage-2 LPDM joint training (reference: trainer.train_prior_latdiff_
    forward_backward_v2)."""
    import dataclasses

    import jax

    import numpy as np

    from amuse_tpu.core import smplx as smplx_mod
    from amuse_tpu.data.cache import WindowCache, betas_for_actor_ids
    from amuse_tpu.parallel import make_mesh, replicate, shard_batch
    from amuse_tpu.train import gesture as tg
    from amuse_tpu.train.checkpoint import CheckpointManager

    run_dir, logger, key = _setup(cfg)
    g = cfg.gesture
    mesh_probe = make_mesh()
    n_dev = mesh_probe.devices.size
    # round UP to a device multiple: P("data") device_put raises otherwise
    bsz = -(-max(g.batch_size, n_dev) // n_dev) * n_dev
    if bsz != g.batch_size:
        print(f"[LPDM-T] batch_size {g.batch_size} -> {bsz} "
              f"(multiple of {n_dev} devices)")
    tcfg = tg.GestureTrainConfig(
        learning_rate=g.learning_rate,
        batch_size=bsz,
        epochs=g.epochs,
        num_inference_steps=g.num_inference_steps,
        monitor_every=g.monitor_every,
        vtex_displacement=g.vtex_displacement,
        checkpoint_every=g.model_save_freq,
        smplx_rep=g.smplx_rep,
        skip_trans=g.skip_trans,
    )
    smplx_path = Path(cfg.data.smplx_model_dir) / "SMPLX_NEUTRAL.npz"
    smplx_model = smplx_mod.load_model(smplx_path) if smplx_path.exists() else None
    if g.vtex_displacement and smplx_model is None:
        print("[LPDM-T] SMPL-X model npz not found; vertex monitor disabled")
    if smplx_model is not None and g.vtex_subsample > 0:
        smplx_model = smplx_mod.subsample_vertices(
            smplx_model, g.vtex_subsample, seed=cfg.seed
        )
        print(
            f"[LPDM-T] vertex monitor subsampled to {smplx_model.num_vertices} "
            "vertices (exact per-vertex, unbiased mean)"
        )

    prior_cfg, den_cfg, _ = _model_cfgs(cfg)

    data = WindowCache(Path(cfg.data.cache_dir))
    mesh = mesh_probe
    if len(data) < bsz:
        clamped = (len(data) // n_dev) * n_dev
        if clamped == 0:
            raise RuntimeError(
                f"window cache has {len(data)} windows but the {n_dev}-device "
                f"mesh needs at least {n_dev} per batch - nothing would train"
            )
        print(f"[LPDM-T] batch {bsz} > cache {len(data)}; clamped to {clamped}")
        bsz = clamped
        tcfg = dataclasses.replace(tcfg, batch_size=bsz)
    # two step programs: with the DDIM/vertex monitor (every
    # ``monitor_every``-th step) and without (all other steps) - monitors
    # carry no gradient, so throttling only thins the logged metrics.
    step_mon = tg.make_train_step(prior_cfg, den_cfg, tcfg, smplx_model, with_monitor=True)
    step_fast = (
        tg.make_train_step(prior_cfg, den_cfg, tcfg, smplx_model, with_monitor=False)
        if tcfg.monitor_every > 1
        else step_mon
    )
    state = tg.init_state(key, prior_cfg, den_cfg, tcfg)
    start_epoch = 0
    if cfg.resume:
        from amuse_tpu.train.checkpoint import restore_train_state

        state, start_epoch = restore_train_state(cfg.resume, state, "LPDM-T")
    state = replicate(mesh, state)
    ckpt = CheckpointManager(run_dir / "checkpoints") if not cfg.debug else None

    from amuse_tpu.data.prefetch import prefetch_to_device
    from amuse_tpu.parallel import batch_sharding

    native = None
    if g.native_loader:
        from amuse_tpu.native import loader as native_mod

        if native_mod.is_available():
            abin = Path(cfg.data.cache_dir) / "train.abin"
            manifest = Path(cfg.data.cache_dir) / "manifest.json"
            stale = (
                abin.exists() and manifest.exists()
                and abin.stat().st_mtime < manifest.stat().st_mtime
            )  # a rebuilt/merged cache must invalidate the derived abin
            if not abin.exists() or stale:
                native_mod.cache_to_abin(
                    cfg.data.cache_dir, abin,
                    fields=("motion", "actor_id", "con", "emo", "sty"),
                )
            native = native_mod.NativeWindowLoader(abin)
            print(f"[LPDM-T] native ABIN loader: {len(native)} windows")
        else:
            print("[LPDM-T] native loader requested but g++ unavailable; "
                  "falling back to the Python mmap cache")

    def host_batches(epoch):
        # epoch-keyed shuffle -> step-identical kill/resume (both loaders)
        if native is not None:
            batches = native.epoch(tcfg.batch_size, seed=cfg.seed * 100_003 + epoch)
        else:
            rng = np.random.default_rng([cfg.seed, epoch])
            batches = data.batches(tcfg.batch_size, rng)
        for b in batches:
            yield {
                "motion": b["motion"],
                "con": b["con"],
                "emo": b["emo"],
                "sty": b["sty"],
                "betas": betas_for_actor_ids(b["actor_id"]),
            }

    with mesh:
        for epoch in range(start_epoch, tcfg.epochs):
            t0, logs = time.time(), {}
            batches = prefetch_to_device(host_batches(epoch), 2, batch_sharding(mesh))
            for i, batch in enumerate(batches):
                fn = step_mon if i % tcfg.monitor_every == 0 else step_fast
                step_key = jax.random.fold_in(jax.random.fold_in(key, epoch), i)
                state, logs = fn(state, batch, step_key)
            logger.log(epoch, {f"train_{k}": float(v) for k, v in logs.items()})
            print(f"[LPDM-T] epoch {epoch + 1}/{tcfg.epochs} ({time.time() - t0:.1f}s): "
                  + ", ".join(f"{k}={float(v):.6f}" for k, v in logs.items()))
            if ckpt and (epoch + 1) % tcfg.checkpoint_every == 0:
                # full state incl. optimizer moments (wOpt semantics)
                ckpt.save(epoch + 1, state, {k: float(v) for k, v in logs.items()})


def task_infer_gesture(cfg, wav_dir: str = "viz_dump/test/speech"):
    """Custom WAV -> SMPL-X npz per 10 s window (reference: trainer.py:500-543)."""
    from amuse_tpu.audio.wavio import load_wav_resampled
    from amuse_tpu.viz.export import export_windows

    run_dir, _, _ = _setup(cfg)
    pipe = _make_pipeline(cfg)
    wavs = sorted(Path(wav_dir).glob("*.wav"))
    if not wavs:
        print(f"[infer] no .wav files found under {wav_dir}")
        return
    from amuse_tpu.data.actors import NAME_TO_ACTOR

    reps = max(1, cfg.test.replication_times)  # trainer.py:550 semantics
    for wav in wavs:
        try:
            wave = load_wav_resampled(wav)
            if wave.shape[-1] < 160_000:
                print(f"[infer] {wav.name}: shorter than one 10 s window; skipped")
                continue
        except Exception as e:  # unreadable/corrupt file: skip, don't abort
            print(f"[infer] {wav.name}: unreadable ({e}); skipped")
            continue
        # BEAT-style stems carry the actor name (e.g. 2_scott_0_9_9); use it
        # so the exported npz gets the right gender/betas
        subject = next((p for p in wav.stem.split("_") if p in NAME_TO_ACTOR), "")
        for wi_rep in range(reps):
            rep = wi_rep
            # fold the wav identity into the seed: seed+rep alone gives
            # every file the same DDIM init latents (eta=0 -> correlated
            # generations across files). crc32, NOT hash(): the builtin is
            # salted per process, which would break run-to-run determinism
            import zlib

            wav_seed = (cfg.seed + rep) * 1_000_003 + (
                zlib.crc32(wav.stem.encode()) & 0xFFFF
            )
            result = pipe.infer_wav(wave, seed=wav_seed)
            rep_dir = run_dir / "gesture" / wav.stem / f"rep{rep}"
            paths = export_windows(rep_dir, result, subject=subject, stem=wav.stem)
            # optional CPU post-process: Blender render + per-window audio
            # mux (reference: animate_ldm_sample_v2); no-op without Blender
            from amuse_tpu.viz.export import render_windows

            videos = render_windows(paths, wav_path=wav, **_viz_kwargs(cfg))
            if videos:
                print(f"[infer] rendered {len(videos)} videos under {rep_dir}")
        print(f"[infer] {wav.name}: {len(paths)} windows x {reps} reps -> "
              f"{run_dir / 'gesture' / wav.stem}")


def _viz_kwargs(cfg) -> dict:
    """cfg.viz -> render_windows kwargs (scene preset/engine/res/samples)."""
    return dict(
        engine=cfg.viz.engine, preset=cfg.viz.preset,
        resolution=cfg.viz.resolution, samples=cfg.viz.samples,
    )


def _export_edit_results(run_dir, task_name, results, viz_kwargs=None):
    from amuse_tpu.core import motion as motion_mod
    from amuse_tpu.viz.export import concat_grid, render_windows

    import numpy as np

    from amuse_tpu.viz.export import export_windows

    for source_key, variants in results.items():
        variant_videos = []
        for variant, (poses, trans) in variants.items():
            poses = np.asarray(motion_mod.zero_jaw(poses))
            paths = export_windows(
                run_dir / task_name / source_key / variant,
                {"poses": poses, "trans": trans, "fps": 30.0},
                subject=source_key.split("_")[0],
                stem=variant,
            )
            vids = render_windows(paths, **(viz_kwargs or {}))
            if vids:
                variant_videos.append(vids[0])
        # reference composes the variants of one source into a 2x2 / 4x2
        # comparison grid (trainer.py:903-1034); gated on ffmpeg
        if len(variant_videos) >= 2:
            cols = 2 if len(variant_videos) <= 4 else 4
            concat_grid(
                variant_videos,
                run_dir / task_name / source_key / "comparison_grid.mp4",
                cols=cols,
            )
    print(f"[edit] {task_name}: {len(results)} sources -> {run_dir / task_name}")


def task_edit_gesture(cfg):
    """Editing tasks driven by cfg.test flags (reference: trainer.py:545-1098).

    Dataset-driven tasks (emotion_control / style_transfer /
    style_Xemo_transfer) need the BEAT data root; the demo path only needs
    two WAVs under viz_dump/test/e_speech (trainer.py:1037-1098).
    """
    from amuse_tpu.infer import editing

    run_dir, _, _ = _setup(cfg)
    pipe = _make_pipeline(cfg)
    t = cfg.test

    # replication semantics (trainer.py:550): each editing task reruns
    # replication_times times with a per-rep seed; style_Xemo additionally
    # redraws WHICH of an emotion's two takes represents it each rep
    # (ldm_evals.py:243's np.random.randint(2)). Same rep{N} output layout
    # as task_infer_gesture.
    reps = max(1, cfg.test.replication_times)
    data_root = Path(cfg.data.data_root)
    for rep in range(reps):
        seed_r = cfg.seed + rep
        if reps > 1:
            print(f"[edit] replication {rep + 1}/{reps} (seed {seed_r})")
        if (t.emotion_control or t.style_transfer or t.style_xemo_transfer) and data_root.exists():
            import numpy as np

            from amuse_tpu.data import beat, eval_sets

            takes = beat.discover(data_root, Path(cfg.data.mosh_root))

            def encode_item(item):
                return editing.encode_take(
                    pipe, item.actor, item.take, 0, item.waveform, item.motion, seed_r
                )

            if t.emotion_control and t.actors:
                items = eval_sets.emotion_control_set(takes, t.actors[0])
                latents = [encode_item(i) for i in items]
                _export_edit_results(
                    run_dir, f"emotion_control/rep{rep}",
                    editing.emotion_control(pipe, latents, seed_r),
                    viz_kwargs=_viz_kwargs(cfg),
                )
            if t.style_transfer and len(t.actors) >= 2:
                a1, a2 = eval_sets.style_transfer_set(takes, t.actors[0], t.actors[1], t.emotion)
                _export_edit_results(
                    run_dir, f"style_transfer/rep{rep}",
                    editing.style_transfer(
                        pipe, [encode_item(i) for i in a1], [encode_item(i) for i in a2], seed_r
                    ),
                    viz_kwargs=_viz_kwargs(cfg),
                )
            if t.style_xemo_transfer and len(t.actors) >= 2:
                try:
                    corners = eval_sets.style_xemo_set(
                        takes, t.actors[0], t.actors[1], "angry", t.emotion,
                        rng=np.random.default_rng(seed_r),
                    )
                except FileNotFoundError as e:
                    # a missing corner take invalidates only this task,
                    # not the other edits in this run
                    print(f"[edit] style_Xemo_transfer skipped: {e}")
                else:
                    enc = {k: encode_item(v) for k, v in corners.items()}
                    _export_edit_results(
                        run_dir, f"style_Xemo_transfer/rep{rep}",
                        editing.style_xemo_transfer(
                            pipe, enc["a1_e1"], enc["a1_e2"], enc["a2_e1"], enc["a2_e2"], seed_r
                        ),
                        viz_kwargs=_viz_kwargs(cfg),
                    )

        # demo path: two wavs, swap emotion (trainer.py:1037-1098)
        demo_dir = Path("viz_dump/test/e_speech")
        wavs = sorted(demo_dir.glob("*.wav"))
        if len(wavs) >= 2:
            from amuse_tpu.audio.wavio import load_wav_resampled
            from amuse_tpu.viz.export import export_windows

            out = editing.demo_emotion_swap(
                pipe, load_wav_resampled(wavs[0]), load_wav_resampled(wavs[1]), seed_r
            )
            for name, (poses, trans) in out.items():
                export_windows(
                    run_dir / "e_gesture" / f"rep{rep}" / name,
                    {"poses": poses, "trans": trans, "fps": 30.0},
                    stem=name,
                )
            print(f"[edit] demo emotion swap -> {run_dir / 'e_gesture' / f'rep{rep}'}")
        elif rep == 0 and not (t.emotion_control or t.style_transfer or t.style_xemo_transfer):
            print(f"[edit] no demo wavs under {demo_dir} and no cfg.test task enabled")
            break


def task_eval_gesture(cfg):
    """Quantitative eval over the window cache: FGD / diversity / APE / AVE /
    beat alignment - the metrics the reference published only in its paper
    (its in-repo metric code was dead, SURVEY §2.1)."""
    import json

    from amuse_tpu.core import smplx as smplx_mod
    from amuse_tpu.data.cache import WindowCache
    from amuse_tpu.eval.runner import evaluate_cache

    run_dir, logger, _ = _setup(cfg)
    # position-space APE/AVE/beat-align via the JAX SMPL-X FK when the body
    # model is available; rotation-space fallback otherwise (labelled).
    # Checked FIRST (before any model/pipeline build) so strict runs fail
    # fast and every run states its metric space up front.
    smplx_path = Path(cfg.data.smplx_model_dir) / "SMPLX_NEUTRAL.npz"
    smplx_model = smplx_mod.load_model(smplx_path) if smplx_path.exists() else None
    if smplx_model is None:
        msg = (
            f"[eval] SMPL-X body model NOT loaded (looked for {smplx_path}).\n"
            "[eval] APE/AVE/beat-align will run in ROTATION space - these "
            "numbers are NOT comparable to position-space (paper) metrics.\n"
            "[eval] To fix: download SMPLX_NEUTRAL.npz from smpl-x.is.tue.mpg.de "
            f"(licensed, not vendorable) into {cfg.data.smplx_model_dir}/, or "
            "set data.smplx_model_dir. The report will be labelled "
            'metric_space: "rotation".'
        )
        if cfg.test.strict_position_space:
            raise SystemExit(
                msg + "\n[eval] test.strict_position_space=true: refusing to "
                "produce rotation-space numbers."
            )
        print(msg)
    else:
        print(f"[eval] SMPL-X body model loaded from {smplx_path}; "
              "APE/AVE/beat-align in position space (FK joints)")
    from amuse_tpu.eval import embedder as emb

    emb_path = Path(cfg.data.embedder_path) if cfg.data.embedder_path else emb.DEFAULT_WEIGHTS
    embedder = None
    if emb_path.exists():
        embedder = emb.load(emb_path)
        print(f"[eval] external FGD embedder: {emb_path} ({embedder[2]})")
    elif cfg.data.embedder_path:
        # explicitly configured but absent: a config error, not a soft skip -
        # silently omitting the headline metric would hide the typo
        raise SystemExit(
            f"[eval] data.embedder_path={cfg.data.embedder_path} does not "
            "exist (train one with --fn train_embedder, or unset the knob "
            "to fall back to the bundled synthetic-regime weights)"
        )
    else:
        print(f"[eval] no external embedder at {emb_path}; fgd_embedder "
              "omitted (train one with --fn train_embedder)")
    pipe = _make_pipeline(cfg)
    cache = WindowCache(Path(cfg.data.cache_dir))
    results = evaluate_cache(
        pipe, cache,
        batch_size=min(cfg.gesture.batch_size, len(cache)),
        seed=cfg.seed, smplx_model=smplx_model, embedder=embedder,
    )
    print("[eval]", json.dumps(results, indent=1))
    if not cfg.debug:
        (run_dir / "eval_results.json").write_text(json.dumps(results, indent=1))


def task_blender_setup(cfg):
    """Bare Blender -> render/retarget-ready (reference load_in_blender,
    visualizer.py:398-583): install+enable every addon archive found under
    data.blender_addons_dir, verify, and say exactly what is still missing
    and where to obtain it (several addons are licensed; zero egress here)."""
    from amuse_tpu.viz import blender_setup as bs

    report = bs.setup(cfg.data.blender_addons_dir)
    report.print()
    if not report.ok:
        raise SystemExit(1)


def _slice_window_npzs(cfg, npz_path: Path, out_root: Path) -> list:
    """Slice ONE motion npz into per-window SMPL-X npzs under
    ``out_root/<stem>/seq_<i>/<stem>.npz`` (the single windowing/layout
    authority for render_GT and render_baselines) -> [npz path, ...]."""
    import numpy as np

    from amuse_tpu.viz.export import write_smplx_npz

    d = np.load(npz_path)
    poses = np.asarray(d["poses"], np.float32)
    trans = np.asarray(d["trans"], np.float32)
    win = cfg.data.window_frames
    subject = npz_path.stem.split("_")[1] if "_" in npz_path.stem else ""
    paths = []
    for i in range(poses.shape[0] // win):
        p = out_root / npz_path.stem / f"seq_{i}" / f"{npz_path.stem}.npz"
        write_smplx_npz(
            p, poses[i * win : (i + 1) * win].reshape(win, -1, 3),
            trans[i * win : (i + 1) * win], subject=subject,
            fps=float(cfg.data.fps),
        )
        paths.append(p)
    return paths


def _gt_window_npzs(cfg, out_root: Path, limit: int = 0, stems=None):
    """Slice ground-truth MoSh npzs into per-window SMPL-X npzs
    (render_GT's data leg, visualizer.py:91-177) -> [(stem, wav, [npz...])].

    ``stems``: restrict to these take stems (render_baselines only needs GT
    for takes a baseline actually covers; slicing the whole mosh_root would
    write thousands of unread npzs)."""
    items = []
    mosh = sorted(Path(cfg.data.mosh_root).glob("*.npz"))
    if stems is not None:
        mosh = [p for p in mosh if p.stem in stems]
    if cfg.test.actors:
        mosh = [p for p in mosh
                if any(a in p.stem.split("_") for a in cfg.test.actors)]
    if limit:
        mosh = mosh[:limit]
    for npz_path in mosh:
        paths = _slice_window_npzs(cfg, npz_path, out_root)
        if not paths:
            continue
        wavs = sorted(Path(cfg.data.data_root).glob(f"*/{npz_path.stem}.wav"))
        items.append((npz_path.stem, wavs[0] if wavs else None, paths))
    return items


def task_render_gt(cfg):
    """Render ground-truth MoSh windows to mp4 (reference render_GT,
    visualizer.py:91-177): per-window SMPL-X npz -> Blender render -> audio
    mux. The npz tree is written even without Blender (it is the product;
    rendering is optional CPU post-processing)."""
    from amuse_tpu.viz.export import have_binary, render_windows

    run_dir, logger, _ = _setup(cfg)
    out_root = run_dir / "GT"
    items = _gt_window_npzs(cfg, out_root)
    if not items:
        print(f"[render_GT] no MoSh npz under {cfg.data.mosh_root}")
        return
    n_vid = 0
    vk = _viz_kwargs(cfg)
    for stem, wav, paths in items:
        videos = render_windows(paths, wav_path=wav, **vk)
        n_vid += len(videos)
        print(f"[render_GT] {stem}: {len(paths)} windows, {len(videos)} videos")
    if not have_binary("blender"):
        print("[render_GT] blender not on PATH: npz written, no mp4s - run "
              "--fn blender_setup after installing Blender")
    print(f"[render_GT] {sum(len(p) for _, _, p in items)} window npz, "
          f"{n_vid} videos -> {out_root}")


def task_render_baselines(cfg):
    """Render baseline methods' outputs side by side with ground truth
    (reference render_baselines, visualizer.py:179-296): each
    data.baselines_root/<method>/<take_stem>.npz is rendered with the same
    machinery and grid-composited against the GT render of the same take."""
    from amuse_tpu.viz.export import concat_grid, have_binary, render_windows

    run_dir, logger, _ = _setup(cfg)
    root = Path(cfg.data.baselines_root)
    methods = sorted(p for p in root.iterdir() if p.is_dir()) if root.is_dir() else []
    if not methods:
        print(f"[render_baselines] no <method> dirs under {root}")
        return
    covered = {p.stem for m in methods for p in m.glob("*.npz")}
    gt_items = {
        s: (w, p)
        for s, w, p in _gt_window_npzs(cfg, run_dir / "GT", stems=covered)
    }
    gt_rendered: dict = {}  # stem -> videos; GT is rendered ONCE per take,
    # not once per (method, take) - Blender minutes dominate this task
    for method in methods:
        for npz_path in sorted(method.glob("*.npz")):
            stem = npz_path.stem
            paths = _slice_window_npzs(cfg, npz_path, run_dir / method.name)
            wav, gt_paths = gt_items.get(stem, (None, []))
            base_videos = render_windows(paths, wav_path=wav, **_viz_kwargs(cfg))
            if stem not in gt_rendered:
                gt_rendered[stem] = (
                    render_windows(gt_paths, wav_path=wav, **_viz_kwargs(cfg))
                    if gt_paths else []
                )
            gt_videos = gt_rendered[stem]
            for i, (gv, bv) in enumerate(zip(gt_videos, base_videos)):
                concat_grid(
                    [gv, bv],
                    run_dir / method.name / stem / f"seq_{i}" / "gt_vs_baseline.mp4",
                    cols=2,
                )
            print(f"[render_baselines] {method.name}/{stem}: "
                  f"{len(paths)} windows, {len(base_videos)} videos")
    if not have_binary("blender"):
        print("[render_baselines] blender not on PATH: npz written, no mp4s")


def task_train_embedder(cfg):
    """Train the EXTERNAL FGD feature extractor on ground-truth windows only
    (never the generative model) and save a single-file npz with provenance.
    Output: <out_dir>/<ts>/embedder.npz; point data.embedder_path at it (or
    copy over amuse_tpu/eval/weights/motion_embedder_synthetic.npz)."""
    import time

    import jax.numpy as jnp
    import numpy as np

    from amuse_tpu.core import motion as motion_mod
    from amuse_tpu.data.cache import WindowCache
    from amuse_tpu.eval import embedder as emb

    run_dir, logger, key = _setup(cfg)
    cache = WindowCache(Path(cfg.data.cache_dir))
    if len(cache) == 0:
        raise SystemExit("[embedder] empty window cache - run prepare_data first")
    e = cfg.embedder
    ecfg = emb.EmbedderConfig(
        in_dim=333, window=cfg.data.window_frames,
        channels=tuple(e.channels), latent_dim=e.latent_dim,
    )
    params = emb.init_params(key, ecfg)
    step, opt = emb.make_train_step(ecfg, e.learning_rate)
    opt_state = opt.init(params)
    bsz = max(1, min(e.batch_size, len(cache)))
    n_batches = len(cache) // bsz
    order = np.arange(n_batches * bsz)
    rng = np.random.default_rng(cfg.seed)
    for epoch in range(e.epochs):
        t0 = time.time()
        rng.shuffle(order)
        tot = 0.0
        for b in range(n_batches):
            idx = order[b * bsz : (b + 1) * bsz]
            motion = jnp.asarray(np.stack([cache[int(i)]["motion"] for i in idx]))
            m6 = motion_mod.axis_angle_to_feats6d(motion)
            params, opt_state, loss = step(params, opt_state, m6)
            tot += float(loss)
        if epoch % 10 == 0 or epoch == e.epochs - 1:
            print(f"[embedder] epoch {epoch + 1}/{e.epochs} "
                  f"({time.time() - t0:.1f}s): recon={tot / max(n_batches, 1):.6f}")
    provenance = (
        f"trained by --fn train_embedder on cache={cfg.data.cache_dir} "
        f"({len(cache)} windows), {e.epochs} epochs, seed {cfg.seed}"
    )
    out = run_dir / "embedder.npz"
    emb.save(out, params, ecfg, provenance)
    print(f"[embedder] saved -> {out}")


def task_bvh2smplx(cfg):
    """BEAT BVH -> SMPL-X npz (reference: dm.beat2smplnpz +
    retarget_smpl2bvh2beatnpzWbetas.py).

    Two legs: (1) the Auto-Rig-Pro retarget runs inside Blender (external
    native tool, gated on availability); (2) the Euler->axis-angle 55-joint
    conversion is pure numpy (data/bvh.py) and also accepts BVHs that were
    already retargeted (>= 55 joints), so the math leg works Blender-free.
    Outputs land in ``data.mosh_root`` ready for ``prepare_data``.
    """
    import subprocess

    from amuse_tpu.data.bvh import (
        convert_retargeted_bvh_to_npz,
        looks_like_smplx_rig,
        parse_bvh,
    )
    from amuse_tpu.viz.export import have_binary

    bvhs = sorted(Path(cfg.data.data_root).glob("*/*.bvh"))
    if not bvhs:
        print(f"[bvh2smplx_] no .bvh files under {cfg.data.data_root}")
        return
    out_root = Path(cfg.data.mosh_root)
    blender = have_binary("blender")
    shim = Path(__file__).resolve().parents[1] / "viz" / "blender" / "retarget_bvh.py"
    done = skipped = 0
    for bvh_path in bvhs:
        stem = bvh_path.stem  # e.g. 2_scott_0_9_9
        parts = stem.split("_")
        subject = parts[1] if len(parts) > 1 and not parts[1].isdigit() else ""
        out_npz = out_root / f"{stem}.npz"
        if out_npz.exists():
            continue  # restartable, like every reference preprocessing step
        parsed = parse_bvh(bvh_path)  # parse once; reused by the converter
        n_joints = sum(1 for j in parsed.joints if not j.is_end_site)
        # joint COUNT alone cannot separate an ARP-exported SMPL-X rig from
        # a raw ~75-joint BEAT capture; require the SMPL-X skeleton names
        # or the permutation map would silently write garbage npz
        if n_joints >= 55 and looks_like_smplx_rig(parsed):
            convert_retargeted_bvh_to_npz(
                bvh_path, out_npz, subject=subject, parsed=parsed
            )
            done += 1
        elif blender and cfg.data.tpose_smplx_bvh:
            cmd = [
                "blender", "-b", "-P", str(shim), "--",
                str(bvh_path), cfg.data.tpose_smplx_bvh, str(out_npz),
                cfg.data.arp_preset, subject,
            ]
            rc = subprocess.run(cmd, capture_output=True, text=True)
            retargeted = out_npz.with_suffix(out_npz.suffix + ".retargeted.bvh")
            if rc.returncode != 0 or not retargeted.exists():
                print(f"[bvh2smplx_] blender failed on {bvh_path.name}: "
                      f"{rc.stderr[-300:]}")
                skipped += 1
            else:
                # numpy leg runs HERE: Blender's Python has no jax/repo
                convert_retargeted_bvh_to_npz(retargeted, out_npz, subject=subject)
                done += 1
        else:
            reason = (
                "needs Blender + Auto-Rig-Pro (not available here)"
                if not blender
                else "set data.tpose_smplx_bvh to the SMPL-X T-pose rig"
            )
            print(f"[bvh2smplx_] {bvh_path.name}: {n_joints}-joint BEAT "
                  f"skeleton; retarget {reason}")
            skipped += 1
    print(f"[bvh2smplx_] converted {done}, skipped {skipped} -> {out_root}")


TASKS = {
    "eval_gesture": task_eval_gesture,
    "train_embedder": task_train_embedder,
    "blender_setup": task_blender_setup,
    "render_gt": task_render_gt,
    "render_baselines": task_render_baselines,
    "train_audio": task_train_audio,
    "train_gesture": task_train_gesture,
    "infer_gesture": task_infer_gesture,
    "edit_gesture": task_edit_gesture,
    "prepare_data": task_prepare_data,
    "bvh2smplx_": task_bvh2smplx,
}


def main(argv=None):
    from amuse_tpu.cli.config import load_config, parse_cli_overrides

    p = argparse.ArgumentParser(prog="amuse-tpu")
    p.add_argument("--fn", required=True, choices=sorted(TASKS))
    p.add_argument("--cfg", default=None, help="JSON config file")
    p.add_argument("--set", action="append", default=[], help="override key=value")
    p.add_argument("--wav-dir", default="viz_dump/test/speech")
    args = p.parse_args(argv)

    cfg = load_config(args.cfg, parse_cli_overrides(args.set))

    # multi-host bring-up BEFORE any jax use: the cluster layer exports
    # JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID
    # (cluster/jobs.py); without this call each host would silently run an
    # independent single-host training instead of one SPMD job
    from amuse_tpu.parallel import initialize_distributed

    if initialize_distributed():
        import jax

        print(f"[distributed] initialized: process {jax.process_index()} "
              f"of {jax.process_count()}, {jax.device_count()} devices total")

    if args.fn == "infer_gesture":
        TASKS[args.fn](cfg, args.wav_dir)
    else:
        TASKS[args.fn](cfg)


if __name__ == "__main__":
    main()
