"""Shared pytest fixtures.  Ray is initialised ONCE per session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
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
    ctx.enable_progress_bar_name_truncation = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def micro_fixture(tmp_path_factory):
    """Generate the micro synthetic web once per session."""
    from spider_ray.fixtures.gen import generate

    root = tmp_path_factory.mktemp("micro")
    generate("micro", str(root))
    return str(root)
