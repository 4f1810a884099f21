"""Session-scoped Ray + pipeline fixtures (one ray.init per pytest session)."""

from __future__ import annotations

import logging

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level=logging.ERROR)
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def pipeline_result(ray_session):
    """Full run on the seeded replica-0 corpus, shared across tests."""
    from payor_linkage.pipeline import run_linkage
    from payor_linkage.synth import synth_documents

    return run_linkage(synth_documents(1))


@pytest.fixture(scope="session")
def corpus_table(ray_session):
    from payor_linkage.synth import build_replica

    return build_replica(0)
