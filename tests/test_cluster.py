"""Tests for job templating and the ASHA sweep."""

import re
import numpy as np

from amuse_tpu.cluster import ASHA, JobSpec, LocalRunner, render_script
from amuse_tpu.cluster.sweep import PRIOR_SPACE, Uniform, best_trial, sample_config


class TestJobs:
    def test_render_script_single_host(self):
        spec = JobSpec("j1", ["python", "-c", "'print(1)'"], env={"A": "b"})
        s = render_script(spec)
        assert "export A='b'" in s
        assert "JAX_COORDINATOR_ADDRESS" not in s
        assert "timeout 28800s" in s

    def test_render_script_multi_host(self):
        spec = JobSpec("j2", ["train"], num_hosts=4)
        s = render_script(spec, host_index=2, coordinator="10.0.0.1:8476")
        assert "export JAX_NUM_PROCESSES=4" in s
        assert "export JAX_PROCESS_ID=2" in s

    def test_local_runner_executes(self, tmp_path):
        runner = LocalRunner(tmp_path)
        rc = runner.submit(JobSpec("ok", ["true"], workdir=str(tmp_path)))
        assert rc == 0
        assert runner.ledger.get("ok")["state"] == "finished"
        rc = runner.submit(JobSpec("bad", ["false"], workdir=str(tmp_path)))
        assert rc != 0


class TestSweep:
    def test_space_sampling(self):
        rng = np.random.default_rng(0)
        cfg = sample_config(PRIOR_SPACE, rng)
        assert cfg["batch_size"] in (16, 32, 64)
        assert 1e-5 <= cfg["learning_rate"] <= 1e-3
        assert 0.0 <= cfg["dropout"] <= 0.3

    def test_log_uniform_is_log_spread(self):
        rng = np.random.default_rng(1)
        xs = [Uniform(1e-5, 1e-1, log=True).sample(rng) for _ in range(500)]
        # median of a log-uniform is the geometric mean of the bounds
        assert 5e-4 < np.median(xs) < 5e-3

    def test_asha_converges_to_good_config(self, tmp_path):
        # objective: |lr - 3e-4| scaled down by budget (more budget = truer
        # signal); the best trial must have lr near 3e-4.
        space = {"lr": Uniform(1e-5, 1e-2, log=True)}

        def objective(cfg, budget, trial_id):
            noise = np.random.default_rng(trial_id + budget).normal() * 0.5 / budget
            return abs(np.log(cfg["lr"]) - np.log(3e-4)) + noise

        opt = ASHA(space, objective, min_budget=1, max_budget=9, reduction=3,
                   seed=0, out_file=tmp_path / "sweep.jsonl")
        best = opt.run(40)
        assert best.budget >= 3
        assert abs(np.log(best.config["lr"]) - np.log(3e-4)) < 2.0
        assert (tmp_path / "sweep.jsonl").exists()

    def test_asha_resumes_from_ledger_identically(self, tmp_path):
        """The docstring promise 'sweeps resume across preemptions' as a
        test: a sweep killed after N units and resumed from its JSONL must
        produce EXACTLY the same future trials (replayed completions + the
        config-RNG stream advanced past the draws already made) as one
        continuous run."""
        space = {"x": Uniform(0, 1)}
        obj = lambda c, b, i: c["x"] / b  # noqa: E731 - deterministic

        continuous = ASHA(space, obj, min_budget=1, max_budget=9,
                          reduction=3, seed=7,
                          out_file=tmp_path / "cont.jsonl")
        continuous.run(12)

        first = ASHA(space, obj, min_budget=1, max_budget=9, reduction=3,
                     seed=7, out_file=tmp_path / "resume.jsonl")
        first.run(7)  # ... preemption ...
        resumed = ASHA(space, obj, min_budget=1, max_budget=9, reduction=3,
                       seed=7, out_file=tmp_path / "resume.jsonl")
        assert len([t for t in resumed.trials if t.state == "completed"]) == 7
        resumed.run(5)

        def key(trials):
            return sorted(
                (t.trial_id, t.rung, t.budget, round(t.score, 12),
                 round(t.config["x"], 12))
                for t in trials if t.state == "completed"
            )

        assert key(resumed.trials) == key(continuous.trials)
        assert best_trial(resumed.trials).config == best_trial(
            continuous.trials).config

    def test_asha_promotes_through_rungs(self):
        space = {"x": Uniform(0, 1)}
        opt = ASHA(space, lambda c, b, i: c["x"], min_budget=1, max_budget=27)
        opt.run(30)
        budgets = {t.budget for t in opt.trials if t.state == "completed"}
        assert len(budgets) >= 2  # at least one promotion happened
        b = best_trial(opt.trials)
        assert b.score <= 0.5


class TestDistributedBringup:
    def test_cli_initializes_from_cluster_env(self, monkeypatch):
        """The env vars render_script exports must actually drive
        jax.distributed.initialize when the CLI starts (regression: the
        helper existed but was never called -> N silent single-host runs)."""
        import jax

        from amuse_tpu.parallel import initialize_distributed

        calls = {}

        def fake_init(coordinator_address, num_processes, process_id):
            calls.update(addr=coordinator_address, n=num_processes, pid=process_id)

        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:8476")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
        monkeypatch.setenv("JAX_PROCESS_ID", "1")
        assert initialize_distributed() is True
        assert calls == {"addr": "10.0.0.1:8476", "n": 2, "pid": 1}

    def test_noop_without_env(self, monkeypatch):
        from amuse_tpu.parallel import initialize_distributed

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert initialize_distributed() is False

    def test_rendered_env_round_trips(self, monkeypatch):
        """render_script's exports parse back into the exact initialize args."""
        import jax

        from amuse_tpu.cluster.jobs import JobSpec, render_script
        from amuse_tpu.parallel import initialize_distributed

        script = render_script(
            JobSpec(name="j", command="true", num_hosts=2),
            host_index=1, coordinator="h0:8476",
        )
        for line in script.splitlines():
            m = re.match(r"export (JAX_\w+)=(.+)", line.strip())
            if m:
                monkeypatch.setenv(m.group(1), m.group(2).strip("'\""))
        calls = {}
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda coordinator_address, num_processes, process_id: calls.update(
                addr=coordinator_address, n=num_processes, pid=process_id
            ),
        )
        assert initialize_distributed() is True
        assert calls == {"addr": "h0:8476", "n": 2, "pid": 1}
