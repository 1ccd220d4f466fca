"""The parallel.mesh surface: both axes of make_mesh, sharding helpers.

The data axis is exercised end-to-end by the train-step parity tests; this
file retires the one untested surface the round-2 verdict flagged (weak #7):
a 2-D (data=4, model=2) mesh where the model axis actually shards a weight
matrix, with XLA inserting the reduce over the contracted dimension.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from amuse_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


class TestMeshShapes:
    def test_default_all_data(self):
        mesh = make_mesh()
        assert mesh.shape[DATA_AXIS] == jax.device_count()
        assert mesh.shape[MODEL_AXIS] == 1

    def test_two_axis_shape(self):
        mesh = make_mesh(n_data=4, n_model=2)
        assert mesh.shape[DATA_AXIS] == 4 and mesh.shape[MODEL_AXIS] == 2


class TestTwoAxisMatmul:
    def test_model_axis_shards_weights_and_matches_single_device(self):
        """x:(B,K) sharded over data; W:(K,N) sharded over model on N.

        y = relu(x @ W1) @ W2 with W2 contracted over the model-sharded
        dimension - XLA must emit the collective; the result must equal the
        unsharded computation bit-for-bit at fp32 tolerance.
        """
        mesh = make_mesh(n_data=4, n_model=2)
        B, K, N = 16, 12, 8
        rs = np.random.RandomState(0)
        x = rs.randn(B, K).astype(np.float32)
        w1 = rs.randn(K, N).astype(np.float32)
        w2 = rs.randn(N, K).astype(np.float32)

        def f(x, w1, w2):
            return jax.nn.relu(x @ w1) @ w2

        expected = f(x, w1, w2)

        xs = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, None)))
        # model parallelism: W1 column-sharded, W2 row-sharded (Megatron
        # layout) - the second matmul contracts over the sharded dim
        w1s = jax.device_put(w1, NamedSharding(mesh, P(None, MODEL_AXIS)))
        w2s = jax.device_put(w2, NamedSharding(mesh, P(MODEL_AXIS, None)))

        out = jax.jit(
            f, out_shardings=NamedSharding(mesh, P(DATA_AXIS, None))
        )(xs, w1s, w2s)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)

        # the intermediate really is model-sharded (not silently replicated):
        # check the compiled output sharding of the first matmul
        h = jax.jit(
            lambda x, w: x @ w,
            out_shardings=NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS)),
        )(xs, w1s)
        assert h.sharding.spec == P(DATA_AXIS, MODEL_AXIS)

    def test_helpers_on_two_axis_mesh(self):
        mesh = make_mesh(n_data=4, n_model=2)
        batch = {"a": np.ones((8, 3), np.float32)}
        sharded = shard_batch(mesh, batch)
        assert sharded["a"].sharding == batch_sharding(mesh)
        params = replicate(mesh, {"w": np.ones((3,), np.float32)})
        assert params["w"].sharding.is_fully_replicated
