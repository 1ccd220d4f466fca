"""Benchmark: the north-star metric - 10 s WAV -> SMPL-X motion, one chip.

Headline: the full fused inference program (Kaldi fbank -> 3x AST -> 50-step
scan-DDIM -> VAE decode -> 6D->axis-angle) at flagship model sizes with
random weights (math/FLOPs identical to trained weights), wall-clock per
10 s window. BASELINE.md target: < 1 s / window / chip; the reference has no
published number (SURVEY §6), so vs_baseline is measured against that 1 s
budget (>1 means faster than target).

The ``extra`` dict captures the training-side numbers that previously lived
only in docs/PARITY.md: the LPDM (stage-2) train step at flagship batch 32
including its 50-step DDIM monitor, the stage-1 AST swap step per quad, raw
denoiser sampling throughput, batched-inference serving throughput, and the
LPDM batch-scaling sweep. Set AMUSE_BENCH_FAST=1 to skip extras.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import time

from benchmarks._timing import timed_best


def _timed(run, sync, iters, reps=3):
    """Best-of-reps mean-of-iters: queue ``iters`` programs per rep, sync
    once per rep, keep the fastest rep. See benchmarks/_timing.timed_best
    for why (the tunnel's bursty per-sync overhead poisoned small-iters
    means through round 4: the 9.03-vs-6.70 ms ddim50 "regression" was
    pure measurement noise)."""
    best, _spread = timed_best(run, sync, iters=iters, reps=reps)
    return best


def headline():
    import jax
    import numpy as np
    import jax.numpy as jnp

    from amuse_tpu.infer.pipeline import GesturePipeline, init_random_params

    params = init_random_params(seed=0)
    pipe = GesturePipeline(params)

    rng = np.random.default_rng(0)
    n_windows = 1
    chunks = jnp.asarray(
        rng.normal(scale=0.05, size=(n_windows, 160000)).astype(np.float32)
    )

    # compile + force a REAL device sync: through the remote-TPU tunnel,
    # block_until_ready returns at dispatch time, so wall-clock must be
    # bounded by a device->host transfer of the result.
    dt = _timed(
        lambda i: pipe.wav_to_motion(jax.random.key(i), chunks),
        lambda out: np.asarray(out[0]),
        iters=20,
    )
    return dt / n_windows


def extra_metrics(deadline: float) -> dict:
    """Secondary training/throughput metrics, each guarded: a failure or an
    elapsed-time overrun must never cost the headline line (remote-TPU
    compiles are slow; the driver may enforce its own wall-clock cap)."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    out = {}

    def over_budget() -> bool:
        return time.monotonic() > deadline

    def guarded(key, fn):
        """Run one leg; record errors under <key>_error instead of dying.

        A RESOURCE_EXHAUSTED gets ONE retry after dropping caches and a
        pause: the shared tunnel chip can carry residual HBM from killed
        sessions (observed r5: stage-1 + batch legs OOM on a chip that
        fits them when clean), and a later server-side cleanup sometimes
        frees it. The retry costs budget only when the first attempt
        already failed.
        """
        import gc

        try:
            if over_budget():
                raise TimeoutError("bench time budget exhausted")
            fn()
            return
        except Exception as e:  # noqa: BLE001 - never lose the headline
            err = e
        if "RESOURCE_EXHAUSTED" in str(err) and not over_budget():
            gc.collect()
            jax.clear_caches()
            time.sleep(30)
            try:
                fn()
                return
            except Exception as e:  # noqa: BLE001
                err = e
        out[key + "_error"] = f"{type(err).__name__}: {err}"[:200]

    # ---- LPDM (stage-2) train step, batch 32: every config the docs quote,
    # so STATUS/PARITY numbers reconcile 1:1 against this driver artifact.
    #   *_monitor      = with the 50-step DDIM generation monitor (no vertex)
    #   *_monitor_free = losses only (the config a production step would run
    #                    between monitor epochs)
    #   *_vtex1024     = monitor + SMPL-X vertex monitors on a 1024-vertex
    #                    subsample of the full 10475-vertex body
    lpdm_configs = [
        ("lpdm_train_step_ms_b32", 32, dict(monitor=True, vtex=False)),
        ("lpdm_train_step_ms_b32_monitor_free", 32,
         dict(monitor=False, vtex=False)),
        ("lpdm_train_step_ms_b32_vtex1024", 32,
         dict(monitor=True, vtex=True, vtex_subsample=1024)),
    ]

    def run_lpdm_legs(configs):
        import gc

        for key, b, kw in configs:
            def leg(key=key, b=b, kw=kw):
                from benchmarks.train_steps import bench as lpdm_bench

                dt, _ = lpdm_bench(batch_size=b, iters=10, **kw)
                out[key] = round(dt * 1000, 2)
                if kw.get("monitor") and not kw.get("vtex"):
                    out[f"lpdm_windows_per_sec_b{b}"] = round(b / dt, 1)

            guarded(key, leg)
            # big-batch legs otherwise fragment the 16 GB HBM for later legs
            gc.collect()
            jax.clear_caches()

    run_lpdm_legs(lpdm_configs)
    if "lpdm_windows_per_sec_b32" in out:  # keep the historical key name
        out["lpdm_windows_per_sec"] = out.pop("lpdm_windows_per_sec_b32")

    # ---- raw denoiser sampling throughput (the steps/sec/chip metric).
    # Runs BEFORE the stage-1 step: its compile is the cheapest of the
    # extras, while the ViT stack's is the most expensive - with three LPDM
    # configs above, a slow tunnel used to exhaust the budget here (r4 dry
    # run) and lose this number. Now only stage-1 degrades on a slow day.
    def ddim_leg():
        from amuse_tpu.diffusion.sampler import ddim_sample
        from amuse_tpu.diffusion.schedulers import make_schedule
        from amuse_tpu.models.denoiser import Denoiser, DenoiserConfig

        cfg = DenoiserConfig()
        model = Denoiser(cfg)
        b = 32
        cond = jnp.zeros((b, cfg.cond_dim))
        params = model.init(
            jax.random.key(0),
            jnp.zeros((b, cfg.latent_tokens, cfg.latent_dim)),
            jnp.zeros((b,), jnp.int32),
            cond, cond, cond,
        )["params"]
        schedule = make_schedule()

        @jax.jit
        def sample(key):
            def denoise(latents, t):
                tt = jnp.full((b,), t, jnp.int32)
                return model.apply({"params": params}, latents, tt, cond, cond, cond)

            return ddim_sample(
                schedule, denoise, key, (b, cfg.latent_tokens, cfg.latent_dim)
            )

        dt = _timed(
            lambda i: sample(jax.random.key(i)),
            lambda r: np.asarray(r[0, 0, 0]),
            iters=50,
        )
        out["ddim50_sample_ms_b32"] = round(dt * 1000, 2)
        out["denoiser_steps_per_sec_chip"] = round(50 * b / dt)

    guarded("denoiser_steps", ddim_leg)

    # ---- batched inference throughput (the SERVING metric). The headline
    # is the latency of ONE 10 s window; a production server batches
    # windows, and the same fused program at batch 32 amortizes dispatch
    # and fills the MXU. realtime_factor = seconds of audio rendered per
    # second of chip time (10 s x windows/s).
    def serving_leg():
        from amuse_tpu.infer.pipeline import GesturePipeline, init_random_params

        params = init_random_params(seed=0)
        pipe = GesturePipeline(params)
        b = 32
        rng = np.random.default_rng(0)
        chunks = jnp.asarray(
            rng.normal(scale=0.05, size=(b, 160000)).astype(np.float32)
        )
        dt = _timed(
            lambda i: pipe.wav_to_motion(jax.random.key(i), chunks),
            lambda o: np.asarray(o[0]),
            iters=10,
        )
        out["infer_windows_per_sec_b32"] = round(b / dt, 1)
        out["infer_realtime_factor_b32"] = round(10.0 * b / dt, 1)

    guarded("infer_throughput", serving_leg)
    import gc

    gc.collect()
    jax.clear_caches()

    # ---- stage-1 AST swap train step (per quad). Runs BEFORE the
    # batch-scaling legs: its ViT activations need the largest contiguous
    # HBM slab of all extras, and the r5 dry run showed b256 legs leave the
    # 16 GB chip too fragmented for it (RESOURCE_EXHAUSTED).
    def stage1_leg():
        from benchmarks.stage1_step import bench_variant

        dt = bench_variant(b=1, iters=5)  # model defaults: fused attn, no remat
        out["stage1_step_ms_per_quad"] = round(dt * 1000, 2)

    guarded("stage1_step", stage1_leg)
    gc.collect()
    jax.clear_caches()

    # ---- batch-scaling legs, LAST (round-4 verdict item 2: "batch is the
    # step-level lever that DOES scale" now carries driver-captured
    # numbers): the heaviest memory users degrade first on a slow day, and
    # their fragmentation cannot hurt the legs above. Full config x batch
    # sweep: benchmarks/batch_scaling.py -> BATCH_SCALING_r05.json.
    run_lpdm_legs([
        (f"lpdm_train_step_ms_b{b}", b, dict(monitor=True, vtex=False))
        for b in (64, 128, 256)
    ])

    return out


def main():
    t0 = time.monotonic()
    dt = headline()
    target = 1.0  # seconds per 10 s window (BASELINE.md north star)
    record = {
        "metric": "wav_to_smplx_latency_10s_window",
        "value": round(dt * 1000.0, 3),
        "unit": "ms",
        "vs_baseline": round(target / dt, 3),
    }
    if os.environ.get("AMUSE_BENCH_FAST") != "1":
        # leave generous room per extra; each checks the deadline before its
        # compile so a slow tunnel degrades to fewer extras, never to no
        # line. 2400 s: ~9 extra legs x (60-120 s tunnel compile + best-of-3
        # measurement) after the headline - 900 s lost the batch-scaling
        # legs whenever the tunnel had a slow day
        budget = float(os.environ.get("AMUSE_BENCH_BUDGET_S", "2400"))
        record["extra"] = extra_metrics(deadline=t0 + budget)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
