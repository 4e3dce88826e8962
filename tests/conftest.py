"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding logic is tested on a host-platform device mesh
(``--xla_force_host_platform_device_count``), the TPU-native answer to
testing multi-node behavior without a cluster (SURVEY.md §4).

Must run before jax initializes, hence env mutation at import time.
"""
import os

# Unit tests run on a virtual CPU mesh even when a real TPU is attached:
# numerics are checked at fp32 against the numpy oracle, and sharding logic
# needs 8 devices. TPU execution is covered by bench.py / integration runs.
# (The environment's TPU plugin ignores JAX_PLATFORMS, so the platform is
# forced through jax.config after import.)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def toy_dataset():
    from relationprediction_tpu.data import dataset
    return dataset.load(os.path.join(os.path.dirname(__file__), "..",
                                     "data", "Toy"))
