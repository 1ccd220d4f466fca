"""PRNG stream policy for the train steps.

Two classes of randomness with different requirements:

  * SEMANTIC draws - diffusion eps, timestep sampling, VAE reparam eps,
    SpecAugment geometry: golden/parity tests pin these, so they stay on
    JAX's default threefry stream (counter-based, stable across backends).
  * REGULARIZATION masks - dropout: nothing depends on the exact bits, only
    on the Bernoulli statistics. These go to XLA's ``rng-bit-generator``
    (``impl="rbg"``), which TPUs execute ~2.3x faster than software
    threefry on the VPU.

Why it matters here: torch-parity attention-weight dropout
(nn.MultiheadAttention(dropout=p), models/transformer.py) draws a
(B, H, Q, K) mask per attention layer; at the flagship LPDM step that is
~208M Bernoulli draws per fwd pass (18 layers of 32x4x~300x~300), and the
threefry ALU cost measured 18.5 ms of the 52.7 ms step (fwd + bwd recompute,
v5e). With the rbg stream the same step runs ~42 ms (docs/PARITY.md round-4
note). The rbg stream is still deterministic per (seed, backend); it is not
guaranteed identical across jaxlib versions, which dropout does not need -
the reference's CUDA dropout comes with the same caveat (cuDNN stream).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout_key(key: jax.Array) -> jax.Array:
    """Derive a hardware-RNG (rbg) dropout key from a threefry key.

    Safe under jit; the derived key supports split/fold_in, so flax's
    ``make_rng("dropout")`` path works unchanged.
    """
    seed = jax.random.bits(key, (), jnp.uint32)
    return jax.random.key(seed, impl="rbg")
