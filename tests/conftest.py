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

# Long-running tests (multi-process clusters, convergence/learning runs,
# heavyweight integration parity) — one list so the fast core subset
# (``pytest -m "not slow"``) stays a quick pre-commit gate while
# ``pytest`` alone still runs everything. Entries are matched as
# "<file basename>::<test name prefix>".
_SLOW = [
    "test_vertex_sharded.py::test_overlapped_halo_matches_sequential",
    "test_vertex_sharded.py::test_vertex_sharded_loss_and_grads_match",
    "test_vertex_sharded.py::test_trainloop_vertex_sharded_one_compile",
    "test_multihost.py::",
    "test_learning_quality.py::",
    "test_model_variants.py::test_basis_variants_train",
    "test_model_variants.py::test_nonlinear_transform_decoder_e2e",
    "test_model_variants.py::test_optimizer_algorithms",
    "test_model_variants.py::test_residual_skip_connections",
    "test_model_variants.py::test_output_transform",
    "test_bf16_streams.py::test_bf16_loss_tracks_f32",
    "test_bf16_streams.py::test_bf16_streams_learn",
    "test_structured_loss.py::test_split_mode_trains",
    "test_parallel.py::test_sharded_loss_matches_single_chip",
    "test_training.py::test_gcn_basis_trains",
    "test_training.py::test_resume_bitexact_with_prefetch",
    "test_staircase2_integration.py::test_trainloop_gcn_block_learns",
    "test_factored_binomial.py::test_factored_matches_tiled_gcn_block",
    "test_factored_binomial.py::test_trainloop_uses_factored_binomial",
    "test_factored_binomial.py::test_mesh_factored_binomial",
    "test_staircase2_mesh.py::test_real_step_sgd_parity",
    "test_staircase2_mesh.py::test_sc2_mesh_loss_and_grads_parity",
    "test_e2e_quality_gate.py::",
    "test_model_variants.py::test_highway_skip_connections",
    "test_model_variants.py::test_partially_random_input",
    "test_model_variants.py::test_variational_gcn_basis",
    "test_model_variants.py::test_random_input",
    "test_parallel.py::test_trainloop_fit_on_mesh",
    "test_parallel.py::test_sharded_staircase_parity",
    "test_parallel.py::test_trainloop_mesh_with_sharded_eval",
    "test_sorted_directions.py::test_sorted_sharded_step_matches",
    "test_vertex_sharded.py::test_vertex_sharded_eval_view",
    "test_vertex_sharded.py::test_vertex_sharded_train_step_learns",
]


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = f"{os.path.basename(item.fspath)}::{item.name}"
        if any(key.startswith(s) or (s.endswith("::") and
                                     key.startswith(s[:-2] + "::"))
               for s in _SLOW):
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def toy_dataset():
    from relationprediction_tpu.data import dataset
    return dataset.load(os.path.join(os.path.dirname(__file__), "..",
                                     "data", "Toy"))
