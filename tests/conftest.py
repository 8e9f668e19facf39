"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding logic (shard_map + halo exchange) is validated on a
virtual 8-device CPU mesh, per SURVEY.md §4. Pallas kernels run in
interpreter mode on CPU (selected automatically inside the ops).
"""

import os

# Must be set before jax is imported by any test module.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

# Persistent compilation cache: XLA-CPU compiles of the scan-based pipelines
# dominate test wall time; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def sample_input_2ch():
    from sdfref.oracle import load_image_gray_alpha

    return load_image_gray_alpha("/root/reference/image/sample_input.png")


@pytest.fixture(scope="session")
def sample_golden():
    from PIL import Image

    return np.asarray(Image.open("/root/reference/image/sample_output.png"))


def random_bool_grid(rng, h, w, p=0.5):
    return rng.random((h, w)) < p
