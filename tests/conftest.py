import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (per task instructions)."""
    import ray
    from ray.data import DataContext
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_models(tmp_path_factory):
    """Shared synthetic CDB + Vocab (FIXTURES.md F2/F3)."""
    from medcat_ray.fixtures import build_fixture_models
    tmp = tmp_path_factory.mktemp("models")
    return build_fixture_models(str(tmp), n_cuis=200)
