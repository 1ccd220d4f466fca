"""Device mesh + sharding helpers: the framework's entire distribution story.

The reference's only parallelism is single-process ``nn.DataParallel`` on the
stage-1 audio model (scripts/trainer.py:203-206, configs/base_new.json:86).
The TPU-native equivalent is SPMD over an ICI mesh:

  * one ``Mesh`` axis ``"data"`` - batches (stage-1 quads, stage-2 windows,
    BEAT cache regeneration chunks) shard over it; parameters replicate
    (largest model ~= 3 ViT-base, well under one chip's HBM),
  * a second axis ``"model"`` is plumbed through for future tensor
    parallelism of attention heads (unused by default: mesh shape (-1, 1)),
  * all collectives (grad psum etc.) are emitted by XLA from the sharding
    annotations - there is no hand-written communication anywhere.

Multi-host extends the same mesh across DCN via
``jax.distributed.initialize``; nothing else changes (SPMD).  Executed, not
just claimed: tools/multihost_dryrun.py runs one LPDM train step as
2 processes x 4 devices (coordinator + per-rank env wiring rendered by
cluster/jobs.py, gloo collectives between ranks) and as 1 process x 8, with
bit-identical losses (MULTIHOST_r04.json, tests/test_multihost.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed() -> bool:
    """Multi-host bring-up from the env vars the cluster layer writes
    (amuse_tpu/cluster/jobs.py): JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID. No-op (returns False) in single-process runs; afterwards
    the same make_mesh() spans all hosts' devices (DCN between hosts, ICI
    within - nothing else in the framework changes, it is all SPMD)."""
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    n = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if not addr or n <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=n,
        process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return True


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Build a (data, model) mesh over all (or given) devices.

    Default: every device on the data axis - the right layout for this
    workload class (small replicated models, large batch of 10 s windows).
    """
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, schedules, small tables)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch axis sharded over data.

    Batch sizes must be divisible by the data-axis size (pad on the host if
    needed; every shipped batch size - 32 windows, N-chunk regen - is).
    """
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. params/opt state) across the mesh."""
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
