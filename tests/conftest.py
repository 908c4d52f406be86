"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import logging

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def kb():
    from entity_extractor_linker_ray.state.kb import KBSnapshot

    return KBSnapshot()


@pytest.fixture(scope="session")
def stub_llm(kb):
    from entity_extractor_linker_ray.state.llm import StubLLMClient

    return StubLLMClient(kb)


@pytest.fixture(scope="session")
def tiny_transcripts():
    from entity_extractor_linker_ray.synthetic import generate_transcripts

    return generate_transcripts(16, seed=7)
