import pytest


@pytest.fixture(scope="session")
def ray_session():
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
    # per-op CPU reservation starves short pipelines at low CPU counts
    # (see bench.py); disable for the 4-cpu test session too
    ctx.op_resource_reservation_enabled = False
    yield
    ray.shutdown()
