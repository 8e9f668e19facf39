"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding logic (shard_map + halo exchange) is validated on a
virtual 8-device CPU mesh, per SURVEY.md §4. Pallas kernels run in
interpreter mode on CPU (selected automatically inside the ops).

Note: pytest plugin autoload (jaxtyping) imports jax before this conftest
runs, so JAX_PLATFORMS env would be ignored; jax.config still works because
no backend has been initialized yet. The environment pins
JAX_PLATFORMS=axon for the real chip — set CHAQ_TPU_TESTS=1 to run the
suite against it instead of CPU.
"""

import os

import jax
import numpy as np
import pytest

if not os.environ.get("CHAQ_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_sessionfinish(session, exitstatus):
    session.config._exitstatus = int(exitstatus)


def pytest_unconfigure(config):
    # The axon TPU plugin hangs for ~50s in interpreter teardown; skip
    # teardown once all reporting is done.
    os._exit(getattr(config, "_exitstatus", 0))


def needs_devices(n: int) -> None:
    """Skip on backends with fewer than n devices (the real-chip run,
    CHAQ_TPU_TESTS=1, has exactly one; the CPU mesh has 8)."""
    have = len(jax.devices())
    if have < n:
        pytest.skip(f"needs {n} devices, have {have}")


@pytest.fixture(scope="session")
def sample_input_2ch():
    from sdfref.oracle import load_image_gray_alpha

    return load_image_gray_alpha("/root/reference/image/sample_input.png")


@pytest.fixture(scope="session")
def sample_golden():
    from PIL import Image

    return np.asarray(Image.open("/root/reference/image/sample_output.png"))
