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


class TestAbandonment:
    def test_producer_exits_when_consumer_abandons(self):
        """Dropping the generator mid-epoch must release the producer thread
        (it used to park forever in q.put with batches pinned on device)."""
        import threading
        import time

        import numpy as np

        from amuse_tpu.data.prefetch import prefetch_to_device

        def slow_batches():
            for i in range(100):
                yield {"x": np.full((4,), i, np.float32)}

        before = threading.active_count()
        gen = prefetch_to_device(slow_batches(), size=2)
        next(gen)  # start the producer, consume one batch
        gen.close()  # abandon mid-epoch
        deadline = time.time() + 5.0
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before, "producer thread leaked"
