"""Session-scoped Ray fixture: one Ray session for the whole pytest run."""

from __future__ import annotations

import pytest
import ray

from clangd_to_neo4j_ray.context import tune_data_context


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    tune_data_context()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
