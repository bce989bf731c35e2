"""Shared test fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def webpages_small(tmp_path_factory):
    """120-doc synthetic webpages fixture written as 6 parquet fragments."""
    from hg_dedup_ray.sources.webpages import write_webpages

    out = tmp_path_factory.mktemp("webpages_small")
    paths, tags = write_webpages(str(out), n_docs=120, seed=42, minlen=32, n_files=6)
    return str(out), paths, tags
