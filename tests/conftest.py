"""Shared test fixtures: ONE Ray session per pytest session."""

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
    from libpdf_ray.ops.util import tune_data_context

    tune_data_context()
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus_dir(tmp_path_factory):
    """A 36-doc corpus (3 of each family) written as 4 parquet shards."""
    from libpdf_ray.fixtures import write_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(out, n_docs=36, seed=42, shards=4, skew_pages=6)
    return out
