import os

import pytest

# must be in the env before ray.init spawns the raylet so worker processes
# inherit it (see search_engine_ray.__init__._tune_worker_malloc)
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(512 << 20))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(512 << 20))
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (do not init per test)."""
    import ray

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
    yield
    ray.shutdown()
