"""Native C++ sampler: build, correctness, and parity with numpy."""
import time

import numpy as np
import pytest

from relationprediction_tpu import native
from relationprediction_tpu.sampling import (AdjacencyIndex,
                                             sample_edge_neighborhood)


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("no C++ toolchain for native sampler")


def make_triples(rng, n_entities=50, n_relations=5, n_edges=300):
    return np.stack([rng.integers(0, n_entities, n_edges),
                     rng.integers(0, n_relations, n_edges),
                     rng.integers(0, n_entities, n_edges)],
                    axis=1).astype(np.int32)


def test_native_sampler_valid_unique(lib_available, rng):
    triples = make_triples(rng)
    adj = AdjacencyIndex(triples, 50)
    edges = native.sample_edge_neighborhood(adj, 150, seed=42)
    assert len(edges) == 150
    assert len(np.unique(edges)) == 150
    assert edges.min() >= 0 and edges.max() < 300


def test_native_sampler_deterministic(lib_available, rng):
    triples = make_triples(rng)
    adj = AdjacencyIndex(triples, 50)
    a = native.sample_edge_neighborhood(adj, 100, seed=7)
    b = native.sample_edge_neighborhood(adj, 100, seed=7)
    c = native.sample_edge_neighborhood(adj, 100, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_native_sampler_full_graph(lib_available, rng):
    triples = make_triples(rng, n_edges=60)
    adj = AdjacencyIndex(triples, 50)
    edges = native.sample_edge_neighborhood(adj, 60, seed=1)
    assert sorted(edges) == list(range(60))


def test_native_sampler_oversample_fails(lib_available, rng):
    triples = make_triples(rng, n_edges=20)
    adj = AdjacencyIndex(triples, 50)
    with pytest.raises(RuntimeError):
        native.sample_edge_neighborhood(adj, 21, seed=1)


def test_native_expansion_stays_connected(lib_available):
    """Same connectivity property as the numpy sampler: early picks stay in
    one component of a two-clique graph."""
    left = [[i, 0, j] for i in range(5) for j in range(5) if i != j]
    right = [[10 + i, 0, 10 + j] for i in range(5) for j in range(5)
             if i != j]
    triples = np.array(left + right, dtype=np.int32)
    adj = AdjacencyIndex(triples, 20)
    for seed in range(5):
        edges = native.sample_edge_neighborhood(adj, 10, seed=seed)
        comp = {0 if triples[e][0] < 10 else 1 for e in edges[:5]}
        assert len(comp) == 1


def test_native_vs_numpy_distribution(lib_available):
    """Degree-weighted expansion concentrates picks around hubs: compare
    hub-edge fractions between numpy and native samplers."""
    rng = np.random.default_rng(0)
    # hub 0 with many spokes + a sparse ring
    hub = [[0, 0, i] for i in range(1, 40)]
    ring = [[40 + i, 0, 40 + (i + 1) % 30] for i in range(30)]
    triples = np.array(hub + ring, dtype=np.int32)
    adj = AdjacencyIndex(triples, 80)

    def hub_frac(sampler):
        fracs = []
        for s in range(20):
            e = sampler(s)
            fracs.append(np.mean(e < len(hub)))
        return np.mean(fracs)

    f_np = hub_frac(lambda s: sample_edge_neighborhood(
        adj, 30, np.random.default_rng(s)))
    f_cc = hub_frac(lambda s: native.sample_edge_neighborhood(
        adj, 30, seed=s))
    assert abs(f_np - f_cc) < 0.15


def test_native_negative_sample(lib_available, rng):
    triples = make_triples(rng, n_edges=100)
    x, y = native.negative_sample(triples, rate=10, n_entities=50, seed=3)
    assert x.shape == (1100, 3)
    np.testing.assert_array_equal(x[:100], triples)
    np.testing.assert_array_equal(y[:100], 1.0)
    np.testing.assert_array_equal(y[100:], 0.0)
    src = np.tile(triples, (10, 1))
    neg = x[100:]
    np.testing.assert_array_equal(neg[:, 1], src[:, 1])
    changed_subj = neg[:, 0] != src[:, 0]
    changed_obj = neg[:, 2] != src[:, 2]
    assert not np.any(changed_subj & changed_obj)
    assert 0.35 < np.mean(neg[:, 2] != src[:, 2]) < 0.65


def test_native_speed_advantage(lib_available):
    """The native sampler should beat numpy by a wide margin at scale."""
    rng = np.random.default_rng(0)
    triples = make_triples(rng, n_entities=2000, n_edges=20000)
    adj = AdjacencyIndex(triples, 2000)

    t0 = time.perf_counter()
    native.sample_edge_neighborhood(adj, 10000, seed=0)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    sample_edge_neighborhood(adj, 10000, np.random.default_rng(0))
    t_numpy = time.perf_counter() - t0

    assert t_native < t_numpy
