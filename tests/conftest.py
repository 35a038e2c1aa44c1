"""Test config: run everything on CPU with 8 virtual devices so the
data-parallel mesh path is exercised without TPU hardware (SURVEY.md §4).

Note: the harness's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon (the TPU plugin), so env vars set here are too late —
``jax.config.update`` still works because no backend has been initialized
when conftest runs.

Set ``WSPC_TPU_TESTS=1`` to SKIP the CPU pin and run the on-device
kernel-equivalence suite (tests/test_tpu_kernels.py) on the real chip:

    WSPC_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if not os.environ.get("WSPC_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class FakeTpuJax:
    """Proxy of the jax module whose default_backend claims TPU.

    Monkeypatch it over a module's ``jax`` attribute to flip that module's
    backend-gated paths (and only that module's — op-library dispatch keeps
    seeing the real CPU backend) without hardware. Shared by the bf16
    hard-error and fake-TPU-mesh tests."""

    @staticmethod
    def default_backend():
        return "tpu"

    def __getattr__(self, name):
        return getattr(jax, name)
