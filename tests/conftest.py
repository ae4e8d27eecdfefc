import pytest
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    if ray.is_initialized():
        # A module created a Ray Dataset at import/collection time and
        # auto-initialized Ray with DEFAULT settings (all CPUs) before this
        # fixture could configure it — every CPU-derived heuristic in the
        # session (join partition counts!) then sizes for the wrong
        # cluster, which broke 7 unrelated hash-shuffle tests suite-wide.
        # Self-heal loudly: tear it down and re-init with the test config.
        import warnings

        warnings.warn(
            "Ray was already initialized at session-fixture time — some "
            "test module builds a Dataset at import scope; make it lazy. "
            "Re-initializing with the test configuration."
        )
        ray.shutdown()
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()
