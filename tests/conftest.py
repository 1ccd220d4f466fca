"""Test harness: force an 8-device virtual CPU mesh before JAX initialises.

TPU hardware in CI is a single chip; multi-chip sharding is validated on a
virtual CPU mesh exactly as the driver's dryrun does (see __graft_entry__.py).
"""

import os

# FORCE the CPU platform: the CI/dev environment pre-sets JAX_PLATFORMS to
# the tunnelled TPU backend, and running unit tests through the tunnel is
# both slow and wrong for the virtual 8-device mesh tests. NOTE: installed
# pytest plugins (jaxtyping) import jax BEFORE this conftest, locking in the
# env-var default - so the platform must also be set via jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
