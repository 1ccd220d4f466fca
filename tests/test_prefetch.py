"""Device prefetch iterator tests."""

import numpy as np
import jax.numpy as jnp

from amuse_tpu.data.prefetch import prefetch_to_device


def test_prefetch_preserves_order_and_values():
    batches = [{"x": np.full((4,), i, np.float32)} for i in range(10)]
    out = list(prefetch_to_device(iter(batches), size=3))
    assert len(out) == 10
    for i, b in enumerate(out):
        assert isinstance(b["x"], jnp.ndarray)
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((4,), i))


def test_prefetch_propagates_errors():
    def gen():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom")

    import pytest

    it = prefetch_to_device(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)
