"""Session-scoped Ray fixture — one Ray session for the whole pytest run."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    yield
    ray.shutdown()


@pytest.fixture(autouse=True)
def _release_datasets():
    """Free completed Datasets promptly between tests.

    Each keyed shuffle op holds an aggregator actor pool until its Dataset
    is garbage-collected; across 100+ sequential tests in one 4-CPU session
    the lingering pools accumulate reserved CPU and can wedge a later
    query's executor (observed: x_score_summary deadlocked behind 18 parked
    HashShuffleAggregator actors from prior tests)."""
    yield
    import gc

    gc.collect()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
