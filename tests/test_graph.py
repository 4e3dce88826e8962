import numpy as np
import pytest

from relationprediction_tpu import graph as graph_lib
from tests.oracles import numpy_rgcn as oracle


def random_edges(rng, n_vertices=10, n_relations=4, n_edges=30):
    s = rng.integers(0, n_vertices, n_edges)
    r = rng.integers(0, n_relations, n_edges)
    o = rng.integers(0, n_vertices, n_edges)
    return np.stack([s, r, o], axis=1).astype(np.int32)


def test_build_graph_batch_padding(rng):
    edges = random_edges(rng)
    g = graph_lib.build_graph_batch(edges, 10, 4, pad_to=40)
    assert g.senders.shape == (40,)
    assert float(g.mask.sum()) == 30
    np.testing.assert_array_equal(np.asarray(g.senders[:30]), edges[:, 0])
    assert np.all(np.asarray(g.senders[30:]) == 10)
    assert np.all(np.asarray(g.receivers[30:]) == 10)


def test_global_normalization_matches_inverse_degree(rng):
    edges = random_edges(rng)
    g = graph_lib.build_graph_batch(edges, 10, 4, pad_to=48)
    w = np.asarray(graph_lib.degree_normalization(g, "forward", "global"))
    expected = oracle.degree_weights(edges[:, 2], 10)
    np.testing.assert_allclose(w[:30], expected, rtol=1e-6)
    assert np.all(w[30:] == 0)

    w_b = np.asarray(graph_lib.degree_normalization(g, "backward", "global"))
    expected_b = oracle.degree_weights(edges[:, 0], 10)
    np.testing.assert_allclose(w_b[:30], expected_b, rtol=1e-6)


def test_local_normalization(rng):
    edges = random_edges(rng)
    g = graph_lib.build_graph_batch(edges, 10, 4, pad_to=32)
    w = np.asarray(graph_lib.degree_normalization(g, "forward", "local"))
    expected = oracle.local_weights(edges[:, 2], edges[:, 1], 10, 4)
    np.testing.assert_allclose(w[:30], expected, rtol=1e-6)


def test_none_normalization_is_mask(rng):
    edges = random_edges(rng)
    g = graph_lib.build_graph_batch(edges, 10, 4, pad_to=33)
    w = np.asarray(graph_lib.degree_normalization(g, "forward", "none"))
    np.testing.assert_array_equal(w, np.asarray(g.mask))


def test_aggregate_equals_spmm(rng):
    edges = random_edges(rng)
    g = graph_lib.build_graph_batch(edges, 10, 4, pad_to=64)
    msgs = rng.standard_normal((64, 8)).astype(np.float32)
    w = graph_lib.degree_normalization(g, "forward", "global")
    out = np.asarray(graph_lib.aggregate(msgs, w, g.receivers, 10))

    expected = oracle.aggregate(msgs[:30],
                                oracle.degree_weights(edges[:, 2], 10),
                                edges[:, 2], 10)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_pad_too_small_raises(rng):
    edges = random_edges(rng)
    with pytest.raises(ValueError):
        graph_lib.build_graph_batch(edges, 10, 4, pad_to=10)
