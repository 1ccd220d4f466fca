"""Multi-HOST bring-up proof: 2 x jax.distributed processes, one SPMD step.

The reference's entire distributed story is single-process
``nn.DataParallel`` (reference scripts/trainer.py:203-206).  Our replacement
claims "multi-host is ``jax.distributed.initialize`` + nothing else changes"
(amuse_tpu/parallel/mesh.py).  This tool EXECUTES that sentence:

  * driver mode (default): uses ``cluster.jobs.LocalRunner.submit_multihost``
    to render+launch worker processes through the SAME shell-script
    templating and JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env wiring a real fleet job would use; each leg runs
    2-process and 1-process with identical global inputs and compares
    losses.  Writes MULTIHOST_r{N}.json.
  * ``--worker``: one rank.  Env-driven ``initialize_distributed()``, global
    data-parallel mesh over ALL processes' devices, ONE real train step with
    gradients psummed across the mesh — i.e. across process boundaries via
    the gloo CPU collectives backend.

Legs:
  lpdm  - the stage-2 LPDM train step (DDIM monitor + vertex monitors).
          ``--dims tiny``    : 12-frame windows, 16-dim latents (the fast
                               in-suite regression, tests/test_multihost.py)
          ``--dims flagship``: REAL dims — nfeats 333 / window 300 /
                               latent 128 / cond 256 / 50-step DDIM monitor,
                               2 x 4 virtual devices, batch 8 windows
                               (round-4 verdict item 3: toy dims do not
                               exercise flagship padding/sharding across
                               ranks).
  ast   - the stage-1 AST swap step at real token/feature dims ((1024,128)
          fbanks -> 1214 tokens, embed 768, 16 batched reconstructions,
          bf16 + remat) at depth 1, 2 x 1 devices, batch 2 quads. Depth is
          the one reduced knob: all 12 blocks are identical so it adds no
          new shape/padding risk, and the XLA CPU backend retains ~3.6 GB
          per ViT layer per quad (see __graft_entry__
          dryrun_multichip_flagship_ast) — full depth x 2 ranks would be a
          CPU-memory artefact, not a sharding proof.

Determinism: params come from ``init_state(key(0))`` (threefry is
layout-independent) and the batch from a seeded numpy generator, so the
2-process and 1-process runs consume bit-identical global inputs; any loss
difference isolates the cross-process collective path.

Usage:
  python tools/multihost_dryrun.py --out MULTIHOST_r05.json \
      --dims flagship --ast     # the committed-artifact configuration
  python tools/multihost_dryrun.py --out /tmp/mh.json   # fast tiny run
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# global batches, divisible by every mesh size used here
LPDM_BATCH = 8
AST_BATCH = 2


def _lpdm_batch(dims: str):
    import numpy as np

    window = 300 if dims == "flagship" else 12
    cond = 256 if dims == "flagship" else 24
    rng = np.random.default_rng(7)
    return {
        "motion": rng.normal(
            scale=0.1, size=(LPDM_BATCH, window, 168)
        ).astype(np.float32),
        "con": rng.normal(size=(LPDM_BATCH, cond)).astype(np.float32),
        "emo": rng.normal(size=(LPDM_BATCH, cond)).astype(np.float32),
        "sty": rng.normal(size=(LPDM_BATCH, cond)).astype(np.float32),
        "betas": rng.normal(size=(LPDM_BATCH, 8)).astype(np.float32),
    }


def _ast_batch(cfg):
    import numpy as np

    rng = np.random.default_rng(11)
    return {
        "fbanks": rng.normal(
            size=(AST_BATCH, 4, cfg.input_tdim, cfg.input_fdim)
        ).astype(np.float32),
        "emo_id": rng.integers(0, 8, size=(AST_BATCH,)).astype(np.int32),
        "a1_id": rng.integers(0, 30, size=(AST_BATCH,)).astype(np.int32),
        "a2_id": rng.integers(0, 30, size=(AST_BATCH,)).astype(np.int32),
    }


def worker(out_path: str | None, leg: str, dims: str) -> dict:
    """One rank: env-driven distributed init, one global-mesh train step."""
    import jax

    # the dev/CI sitecustomize may have imported jax with JAX_PLATFORMS
    # pinned to the tunnelled TPU; force CPU the same way tests/conftest does
    jax.config.update("jax_platforms", "cpu")

    from amuse_tpu.parallel import initialize_distributed

    initialize_distributed()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from amuse_tpu.parallel import make_mesh

    n_proc = jax.process_count()
    pid = jax.process_index()
    n_dev = jax.device_count()
    print(
        f"[worker] leg={leg} dims={dims}: process {pid}/{n_proc}, "
        f"{n_dev} global devices ({jax.local_device_count()} local)",
        flush=True,
    )

    mesh = make_mesh()  # ALL devices, across every process, on the data axis
    data_sh = NamedSharding(mesh, P("data"))
    repl_sh = NamedSharding(mesh, P())

    def put_batch(x):
        # each process contributes the rows its local devices own
        rows = x.shape[0] // n_proc
        local = x[pid * rows : (pid + 1) * rows]
        return jax.make_array_from_process_local_data(data_sh, local, x.shape)

    def put_repl(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(repl_sh, x, x.shape)

    if leg == "lpdm":
        from amuse_tpu.core import smplx as smplx_mod
        from amuse_tpu.models.denoiser import DenoiserConfig
        from amuse_tpu.models.vae import PriorConfig
        from amuse_tpu.train.gesture import (
            GestureTrainConfig,
            init_state,
            make_train_step,
        )

        if dims == "flagship":
            prior_cfg = PriorConfig()  # nfeats 333 / window 300 / latent 128
            den_cfg = DenoiserConfig()  # cond 256, 9 layers
            cfg = GestureTrainConfig(
                num_inference_steps=50, vtex_displacement=True
            )
        else:
            prior_cfg = PriorConfig(
                nfeats=333, latent_dim=16, ff_size=32, num_layers=3,
                num_heads=2, window=12,
            )
            den_cfg = DenoiserConfig(
                latent_dim=16, ff_size=32, num_layers=3, num_heads=2,
                cond_dim=24,
            )
            cfg = GestureTrainConfig(
                num_inference_steps=5, vtex_displacement=True
            )

        batch = jax.tree.map(put_batch, _lpdm_batch(dims))
        state = init_state(jax.random.key(0), prior_cfg, den_cfg, cfg)
        state = jax.tree.map(put_repl, state)
        step = make_train_step(
            prior_cfg, den_cfg, cfg, smplx_mod.make_test_model(),
            with_monitor=True,
        )
        with mesh:
            state, logs = step(state, batch, jax.random.key(1))
            jax.block_until_ready(state.params)
    elif leg == "ast":
        from amuse_tpu.models.ast import ASTConfig
        from amuse_tpu.train import audio as ta

        # real token/feature dims, reduced depth (see module docstring)
        ast_cfg = ASTConfig(depth=1, remat=True)
        acfg = ta.AudioTrainConfig()
        batch = jax.tree.map(put_batch, _ast_batch(ast_cfg))
        state = ta.init_state(jax.random.key(0), acfg, jnp.bfloat16, ast_cfg)
        state = jax.tree.map(put_repl, state)
        step, _ = ta.make_train_step(acfg, jnp.bfloat16, ast_cfg)
        with mesh:
            state, logs = step(state, batch, jax.random.key(1))
            jax.block_until_ready(state.params)
    else:
        raise ValueError(f"unknown leg {leg!r}")

    logs = {k: float(v) for k, v in logs.items()}
    assert all(np.isfinite(v) for v in logs.values()), logs
    result = {
        "leg": leg,
        "dims": dims,
        "process_index": pid,
        "process_count": n_proc,
        "global_devices": n_dev,
        "local_devices": jax.local_device_count(),
        "mesh": dict(zip(mesh.axis_names, mesh.devices.shape)),
        "logs": logs,
    }
    print(f"[worker] step ok — {json.dumps(result)}", flush=True)
    if out_path and pid == 0:
        Path(out_path).write_text(json.dumps(result, indent=1))
    return result


def _run_leg(
    run_dir: Path, leg: str, dims: str, num_hosts: int, local_devices: int,
    port: int,
) -> dict:
    """Render + launch one leg (num_hosts ranks) via the cluster layer."""
    from amuse_tpu.cluster.jobs import JobSpec, LocalRunner

    out = run_dir / f"result_{leg}_{dims}_h{num_hosts}.json"
    spec = JobSpec(
        name=f"multihost_dryrun_{leg}_{dims}_h{num_hosts}",
        command=[
            sys.executable,
            str(REPO / "tools" / "multihost_dryrun.py"),
            "--worker",
            "--leg", leg,
            "--dims", dims,
            "--result",
            str(out),
        ],
        env={
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": f"--xla_force_host_platform_device_count={local_devices}",
            "PYTHONPATH": str(REPO),
        },
        num_hosts=num_hosts,
        workdir=str(REPO),
        max_runtime_hours=1.0,
    )
    runner = LocalRunner(run_dir)
    # scrub the remote-TPU tunnel hooks: this leg must be pure-CPU and must
    # not depend on tunnel health (same scrub as __graft_entry__ dryruns)
    env = {k: v for k, v in os.environ.items() if not k.startswith(("PALLAS_AXON", "AXON_"))}
    rcs = runner.submit_multihost(spec, coordinator=f"localhost:{port}", env=env)
    if any(rcs) or not out.exists():
        for host in range(num_hosts):
            log = run_dir / f"{spec.name}.h{host}.log"
            print(f"----- {log} -----\n{log.read_text()[-3000:]}", file=sys.stderr)
        raise RuntimeError(f"leg {leg} num_hosts={num_hosts} failed: exit codes {rcs}")
    return json.loads(out.read_text())


def _compare(run_dir: Path, leg: str, dims: str, total_devices: int, port: int) -> dict:
    two = _run_leg(
        run_dir, leg, dims, num_hosts=2,
        local_devices=total_devices // 2, port=port,
    )
    one = _run_leg(
        run_dir, leg, dims, num_hosts=1,
        local_devices=total_devices, port=port + 1,
    )
    assert two["process_count"] == 2 and two["global_devices"] == total_devices, two
    assert one["process_count"] == 1 and one["global_devices"] == total_devices, one
    diffs = {
        k: abs(two["logs"][k] - one["logs"][k]) / (abs(one["logs"][k]) + 1e-12)
        for k in one["logs"]
    }
    return {
        "two_process": two,
        "single_process": one,
        "rel_loss_diffs": diffs,
        "loss_match": max(diffs.values()) < 1e-4,
        "bit_identical": all(
            two["logs"][k] == one["logs"][k] for k in one["logs"]
        ),
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--leg", default="lpdm", choices=["lpdm", "ast"])
    p.add_argument("--dims", default="tiny", choices=["tiny", "flagship"])
    p.add_argument("--ast", action="store_true",
                   help="driver mode: also run the AST leg")
    p.add_argument("--result", default=None, help="worker: rank-0 result file")
    p.add_argument("--out", default="MULTIHOST_r05.json")
    p.add_argument("--run-dir", default="/tmp/amuse_multihost")
    args = p.parse_args(argv)

    if args.worker:
        worker(args.result, args.leg, args.dims)
        return

    run_dir = Path(args.run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)

    report = {
        "what": "one train step (grad psum over a data mesh) as 2 "
        "jax.distributed processes (cluster/jobs.py env wiring, gloo "
        "collectives) vs 1 process on the same global devices; identical "
        "global inputs, loss comparison",
        "legs": {},
    }
    lpdm_key = f"lpdm_{args.dims}"
    report["legs"][lpdm_key] = _compare(
        run_dir, "lpdm", args.dims, total_devices=8, port=8477
    )
    if args.ast:
        report["legs"]["ast_depth1_flagship_dims"] = _compare(
            run_dir, "ast", "flagship", total_devices=2, port=8481
        )

    ok = all(leg["loss_match"] for leg in report["legs"].values())
    report["loss_match"] = ok
    # backwards-compatible top-level keys for the primary (LPDM) leg
    report["two_process"] = report["legs"][lpdm_key]["two_process"]
    report["single_process"] = report["legs"][lpdm_key]["single_process"]
    report["rel_loss_diffs"] = report["legs"][lpdm_key]["rel_loss_diffs"]
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps({
        "loss_match": ok,
        "legs": {k: {"loss_match": v["loss_match"],
                     "bit_identical": v["bit_identical"]}
                 for k, v in report["legs"].items()},
    }))
    if not ok:
        raise SystemExit("multi-host loss does not match single-process loss")


if __name__ == "__main__":
    main()
