"""The driver-facing bench surface: guarded extras, no lost legs.

bench.py is what the driver captures into BENCH_r{N}.json; these tests pin
its failure-containment contract WITHOUT a chip: an exhausted budget or a
raising leg must record ``<key>_error`` and never lose the other legs, and
a RESOURCE_EXHAUSTED must get exactly one retry (the residual-HBM chip
state documented in docs/PARITY.md's reconciliation note).
"""

import importlib.util
import time
from pathlib import Path

BENCH = Path(__file__).parents[1] / "bench.py"


def _bench_mod():
    spec = importlib.util.spec_from_file_location("bench_under_test", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestExtraMetricsGuarding:
    def test_exhausted_budget_records_an_error_per_leg(self):
        m = _bench_mod()
        out = m.extra_metrics(deadline=time.monotonic() - 1)
        # every documented extra leg shows up as <key>_error, nothing raises
        assert set(out) == {
            "lpdm_train_step_ms_b32_error",
            "lpdm_train_step_ms_b32_monitor_free_error",
            "lpdm_train_step_ms_b32_vtex1024_error",
            "denoiser_steps_error",
            "infer_throughput_error",
            "stage1_step_error",
            "lpdm_train_step_ms_b64_error",
            "lpdm_train_step_ms_b128_error",
            "lpdm_train_step_ms_b256_error",
        }
        assert all("TimeoutError" in v for v in out.values())

    def test_timed_best_amortizes_and_reports_spread(self):
        from benchmarks._timing import timed_best

        calls = []

        def run(i):
            calls.append(i)
            return i

        best, spread = timed_best(run, lambda r: None, iters=10, reps=3)
        # 1 warmup + 3 reps x 10 iters
        assert len(calls) == 31
        assert best >= 0 and spread >= 1.0


class TestGuardedRetry:
    def test_resource_exhausted_gets_one_retry(self, monkeypatch):
        """A leg that raises RESOURCE_EXHAUSTED once then succeeds must
        produce its value and no _error key; one that keeps raising keeps
        its error; non-OOM failures do not retry. The legs import their
        entry points lazily (``from mod import fn`` at call time), so
        patching the module attributes reaches the real closures."""
        m = _bench_mod()
        monkeypatch.setattr(time, "sleep", lambda s: None)

        flaky_calls = {"n": 0}

        def flaky_bench(batch_size, iters, **kw):
            flaky_calls["n"] += 1
            if flaky_calls["n"] == 1:
                raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
            return 0.010, None  # 10 ms

        import benchmarks.train_steps as ts

        monkeypatch.setattr(ts, "bench", flaky_bench)

        def always_oom(b=1, iters=5):
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")

        import benchmarks.stage1_step as s1

        monkeypatch.setattr(s1, "bench_variant", always_oom)

        def boom(*a, **kw):
            raise RuntimeError("some other failure")

        import amuse_tpu.infer.pipeline as ip

        monkeypatch.setattr(ip, "init_random_params", boom)

        import amuse_tpu.models.denoiser as dn

        monkeypatch.setattr(dn, "Denoiser", boom)

        out = m.extra_metrics(deadline=time.monotonic() + 3600)

        # flaky first leg: failed once, retried, succeeded -> value present
        assert out["lpdm_train_step_ms_b32"] == 10.0
        assert "lpdm_train_step_ms_b32_error" not in out
        # 6 lpdm legs share the fake: 1 failure + 1 retry + 5 clean calls
        assert flaky_calls["n"] == 7  # exactly one retry, none elsewhere
        assert out["lpdm_windows_per_sec"] == 3200.0
        # the monitor-free/vtex/batch legs reuse the now-healthy fake
        assert out["lpdm_train_step_ms_b32_monitor_free"] == 10.0
        assert out["lpdm_train_step_ms_b256"] == 10.0
        # always-OOM leg: retried once, still failing -> error recorded
        assert "RESOURCE_EXHAUSTED" in out["stage1_step_error"]
        # non-OOM failures do NOT retry and keep their error text
        assert "some other failure" in out["infer_throughput_error"]
        assert "some other failure" in out["denoiser_steps_error"]
