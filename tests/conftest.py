"""Test configuration: force an 8-device virtual CPU mesh.

Tests must not occupy the real TPU chip and must exercise multi-device
sharding, so we point JAX at the CPU backend with 8 virtual devices BEFORE
any backend initialization (the env image pins JAX_PLATFORMS=axon via
sitecustomize; jax.config.update overrides it).
"""

import os

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 " + os.environ.get("XLA_FLAGS", "")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from rectpu.data.synthetic import write_synthetic_dataset  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_dir(tmp_path_factory):
    dest = tmp_path_factory.mktemp("ml100k_synth")
    paths = write_synthetic_dataset(dest, train_rows=6000, test_rows=1200, seed=7)
    return paths


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
