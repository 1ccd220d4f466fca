"""Multi-HOST bring-up proof: 2 x jax.distributed processes, one SPMD step.

The reference's entire distributed story is single-process
``nn.DataParallel`` (reference scripts/trainer.py:203-206).  Our replacement
claims "multi-host is ``jax.distributed.initialize`` + nothing else changes"
(amuse_tpu/parallel/mesh.py).  This tool EXECUTES that sentence:

  * driver mode (default): uses ``cluster.jobs.LocalRunner.submit_multihost``
    to render+launch 2 worker processes through the SAME shell-script
    templating and JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env wiring a real fleet job would use, each worker with
    4 virtual CPU devices -> one global 8-device mesh across 2 processes;
    then runs the identical step single-process (1 x 8 devices) and
    compares losses.  Writes MULTIHOST_r{N}.json.
  * ``--worker``: one rank.  Env-driven ``initialize_distributed()``, global
    data-parallel mesh over ALL processes' devices, ONE real LPDM train step
    (tiny dims, DDIM monitor on) with gradients psummed across the mesh —
    i.e. across process boundaries via the gloo CPU collectives backend.

Determinism: params come from ``init_state(key(0))`` (threefry is
layout-independent) and the batch from a seeded numpy generator, so the
2-process and 1-process runs consume bit-identical global inputs; any loss
difference isolates the cross-process collective path.

Usage:
  python tools/multihost_dryrun.py --out MULTIHOST_r04.json
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

BATCH = 8  # global batch, divisible by every mesh size used here
WINDOW = 12
MOTION_DIM = 168
COND_DIM = 24


def _global_batch():
    import numpy as np

    rng = np.random.default_rng(7)
    return {
        "motion": rng.normal(size=(BATCH, WINDOW, MOTION_DIM)).astype(np.float32),
        "con": rng.normal(size=(BATCH, COND_DIM)).astype(np.float32),
        "emo": rng.normal(size=(BATCH, COND_DIM)).astype(np.float32),
        "sty": rng.normal(size=(BATCH, COND_DIM)).astype(np.float32),
        "betas": rng.normal(size=(BATCH, 8)).astype(np.float32),
    }


def worker(out_path: str | None) -> dict:
    """One rank: env-driven distributed init, one global-mesh LPDM step."""
    import jax

    # the dev/CI sitecustomize may have imported jax with JAX_PLATFORMS
    # pinned to the tunnelled TPU; force CPU the same way tests/conftest does
    jax.config.update("jax_platforms", "cpu")

    from amuse_tpu.parallel import initialize_distributed

    initialize_distributed()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from amuse_tpu.core import smplx as smplx_mod
    from amuse_tpu.models.denoiser import DenoiserConfig
    from amuse_tpu.models.vae import PriorConfig
    from amuse_tpu.parallel import make_mesh
    from amuse_tpu.train.gesture import GestureTrainConfig, init_state, make_train_step

    n_proc = jax.process_count()
    pid = jax.process_index()
    n_dev = jax.device_count()
    print(
        f"[worker] process {pid}/{n_proc}, {n_dev} global devices "
        f"({jax.local_device_count()} local)",
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

    batch = jax.tree.map(put_batch, _global_batch())

    prior_cfg = PriorConfig(
        nfeats=333, latent_dim=16, ff_size=32, num_layers=3, num_heads=2, window=WINDOW
    )
    den_cfg = DenoiserConfig(
        latent_dim=16, ff_size=32, num_layers=3, num_heads=2, cond_dim=COND_DIM
    )
    cfg = GestureTrainConfig(num_inference_steps=5, vtex_displacement=True)

    state = init_state(jax.random.key(0), prior_cfg, den_cfg, cfg)
    state = jax.tree.map(put_repl, state)

    step = make_train_step(
        prior_cfg, den_cfg, cfg, smplx_mod.make_test_model(), with_monitor=True
    )
    with mesh:
        state, logs = step(state, batch, jax.random.key(1))
        jax.block_until_ready(state.params)

    logs = {k: float(v) for k, v in logs.items()}
    assert all(np.isfinite(v) for v in logs.values()), logs
    result = {
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


def _run_leg(run_dir: Path, num_hosts: int, local_devices: int, port: int) -> dict:
    """Render + launch one leg (num_hosts ranks) via the cluster layer."""
    from amuse_tpu.cluster.jobs import JobSpec, LocalRunner

    out = run_dir / f"result_h{num_hosts}.json"
    spec = JobSpec(
        name=f"multihost_dryrun_h{num_hosts}",
        command=[
            sys.executable,
            str(REPO / "tools" / "multihost_dryrun.py"),
            "--worker",
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
        max_runtime_hours=0.5,
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
        raise RuntimeError(f"leg num_hosts={num_hosts} failed: exit codes {rcs}")
    return json.loads(out.read_text())


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--result", default=None, help="worker: rank-0 result file")
    p.add_argument("--out", default="MULTIHOST_r04.json")
    p.add_argument("--run-dir", default="/tmp/amuse_multihost")
    args = p.parse_args(argv)

    if args.worker:
        worker(args.result)
        return

    run_dir = Path(args.run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    two = _run_leg(run_dir, num_hosts=2, local_devices=4, port=8477)
    one = _run_leg(run_dir, num_hosts=1, local_devices=8, port=8478)

    assert two["process_count"] == 2 and two["global_devices"] == 8, two
    assert one["process_count"] == 1 and one["global_devices"] == 8, one
    diffs = {
        k: abs(two["logs"][k] - one["logs"][k]) / (abs(one["logs"][k]) + 1e-12)
        for k in one["logs"]
    }
    match = max(diffs.values()) < 1e-4
    report = {
        "what": "one LPDM train step (grad psum over an 8-device data mesh): "
        "2 processes x 4 virtual CPU devices (jax.distributed via "
        "cluster/jobs.py env wiring, gloo collectives) vs 1 process x 8",
        "two_process": two,
        "single_process": one,
        "rel_loss_diffs": diffs,
        "loss_match": match,
    }
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps({"loss_match": match, "rel_loss_diffs": diffs}))
    if not match:
        raise SystemExit("multi-host loss does not match single-process loss")


if __name__ == "__main__":
    main()
