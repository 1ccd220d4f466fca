"""Pallas kernel tests (interpret mode on CPU) vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np

from amuse_tpu.ops.attention import mha_pallas, mha_reference


class TestFusedAttention:
    def test_matches_reference_aligned(self):
        rng = jax.random.key(0)
        q, k, v = (
            jax.random.normal(jax.random.fold_in(rng, i), (2, 2, 128, 64), jnp.float32)
            for i in range(3)
        )
        ref = mha_reference(q, k, v)
        out = mha_pallas(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_matches_reference_unaligned_seq(self):
        # the AST sequence length (1214) is not a block multiple; use a
        # small analogous case (seq 70 -> padded 128) to check masking.
        rng = jax.random.key(1)
        q, k, v = (
            jax.random.normal(jax.random.fold_in(rng, i), (1, 2, 70, 32), jnp.float32)
            for i in range(3)
        )
        ref = mha_reference(q, k, v)
        out = mha_pallas(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_bf16_inputs(self):
        rng = jax.random.key(2)
        q, k, v = (
            jax.random.normal(jax.random.fold_in(rng, i), (1, 1, 128, 64), jnp.bfloat16)
            for i in range(3)
        )
        ref = mha_reference(q, k, v)
        out = mha_pallas(q, k, v, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
        )
