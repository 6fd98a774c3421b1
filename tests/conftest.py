"""Shared test fixtures: one Ray session per pytest run, cached fixture corpus."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    we_initialized = not ray.is_initialized()
    if we_initialized:
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    # list<string> columns (meta_keywords, headings) must stay plain object
    # columns in pandas, not tensor extensions.
    DataContext.get_current().enable_tensor_extension_casting = False
    yield
    # only tear down a session this fixture created — an outer harness's
    # Ray session is not ours to kill
    if we_initialized:
        ray.shutdown()


@pytest.fixture(scope="session")
def fixture_dir() -> str:
    """Smoke-scale fixture corpus (cached across test runs in /tmp)."""
    from fixtures.generate import generate

    out = "/tmp/fixtures/smoke"
    generate(out, n_pages=800, seed=42)
    return out
