"""Per-layer allclose parity of the TPU GCN layers vs the numpy oracle."""
import jax
import numpy as np
import pytest

from relationprediction_tpu import graph as graph_lib
from relationprediction_tpu.models import encoders as enc
from tests.oracles import numpy_rgcn as oracle

V, R, E, D, B = 12, 5, 40, 8, 4


@pytest.fixture
def edges(rng):
    s = rng.integers(0, V, E)
    r = rng.integers(0, R, E)
    o = rng.integers(0, V, E)
    return np.stack([s, r, o], axis=1).astype(np.int32)


@pytest.fixture
def gbatch(edges):
    return graph_lib.build_graph_batch(edges, V, R, pad_to=E + 9)


@pytest.fixture
def features(rng):
    return rng.standard_normal((V, D)).astype(np.float32)


def run_layer(params, variant, gbatch, features, **kw):
    defaults = dict(n_bases=B, use_nonlinearity=True, dropout_keep=1.0,
                    deterministic=True, rng=None, n_vertices=V)
    defaults.update(kw)
    return np.asarray(enc.apply_gcn_layer(params, variant, gbatch,
                                          None if features is None else
                                          features, **defaults))


def test_basis_layer_matches_oracle(rng, edges, gbatch, features):
    params = enc.init_gcn_layer(jax.random.PRNGKey(0), "basis",
                                n_relations=R, d_in=D, d_out=D, n_bases=B)
    params = {k: np.asarray(v) for k, v in params.items()}
    # Reference stores W as [d_in, B, d_out]; our projection flattens it.
    got = run_layer(params, "basis", gbatch, features)
    want = oracle.basis_layer(edges, features, params, V)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_basis_layer_onehot_first_layer(rng, edges, gbatch):
    params = enc.init_gcn_layer(jax.random.PRNGKey(1), "basis",
                                n_relations=R, d_in=D, d_out=D, n_bases=B,
                                onehot_dim=V)
    params = {k: np.asarray(v) for k, v in params.items()}
    got = run_layer(params, "basis", gbatch, None)
    want = oracle.basis_layer(edges, None, params, V)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_basis_no_nonlinearity(rng, edges, gbatch, features):
    params = enc.init_gcn_layer(jax.random.PRNGKey(2), "basis",
                                n_relations=R, d_in=D, d_out=D, n_bases=B)
    params = {k: np.asarray(v) for k, v in params.items()}
    got = run_layer(params, "basis", gbatch, features, use_nonlinearity=False)
    want = oracle.basis_layer(edges, features, params, V,
                              use_nonlinearity=False)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert (got < 0).any()  # really no relu


def test_block_layer_matches_oracle(rng, edges, gbatch, features):
    params = enc.init_gcn_layer(jax.random.PRNGKey(3), "block",
                                n_relations=R, d_in=D, d_out=D, n_bases=B)
    params = {k: np.asarray(v) for k, v in params.items()}
    got = run_layer(params, "block", gbatch, features)
    want = oracle.block_layer(edges, features, params, V, n_blocks=B)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_diag_layer_matches_oracle(rng, edges, gbatch, features):
    params = enc.init_gcn_layer(jax.random.PRNGKey(4), "diag",
                                n_relations=R, d_in=D, d_out=D, n_bases=B)
    params = {k: np.asarray(v) for k, v in params.items()}
    got = run_layer(params, "diag", gbatch, features)
    want = oracle.diag_layer(edges, features, params, V)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_basis_plus_diag_matches_oracle(rng, edges, gbatch, features):
    params = enc.init_gcn_layer(jax.random.PRNGKey(5), "basis_plus_diag",
                                n_relations=R, d_in=D, d_out=D, n_bases=B)
    params = {k: np.asarray(v) for k, v in params.items()}
    got = run_layer(params, "basis_plus_diag", gbatch, features)
    want = oracle.basis_layer(edges, features, params, V, plus_diag=True,
                              add_bias=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_basis_times_diag_matches_oracle(rng, edges, gbatch, features):
    params = enc.init_gcn_layer(jax.random.PRNGKey(6), "basis_times_diag",
                                n_relations=R, d_in=D, d_out=D, n_bases=B)
    params = {k: np.asarray(v) for k, v in params.items()}
    got = run_layer(params, "basis_times_diag", gbatch, features)
    want = oracle.basis_layer(edges, features, params, V,
                              times_diag_sigmoid=True, add_bias=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_self_loop_dropout_train_mode(rng, edges, gbatch, features):
    params = enc.init_gcn_layer(jax.random.PRNGKey(7), "basis",
                                n_relations=R, d_in=D, d_out=D, n_bases=B)
    a = run_layer(params, "basis", gbatch, features, deterministic=False,
                  dropout_keep=0.5, rng=jax.random.PRNGKey(11))
    b = run_layer(params, "basis", gbatch, features, deterministic=False,
                  dropout_keep=0.5, rng=jax.random.PRNGKey(12))
    c = run_layer(params, "basis", gbatch, features, deterministic=True,
                  dropout_keep=0.5, rng=None)
    assert not np.allclose(a, b)
    want = oracle.basis_layer(edges, features,
                              {k: np.asarray(v) for k, v in params.items()}, V)
    np.testing.assert_allclose(c, want, rtol=1e-4, atol=1e-5)


def test_highway_and_residual(rng):
    x_new = rng.standard_normal((V, D)).astype(np.float32)
    x_prev = rng.standard_normal((V, D)).astype(np.float32)
    hw = enc.init_highway(jax.random.PRNGKey(0), (D, D))
    out = np.asarray(enc.apply_highway(hw, x_new, x_prev))
    gates = 1 / (1 + np.exp(-(x_prev @ np.asarray(hw["W"]) + np.asarray(hw["b"]))))
    np.testing.assert_allclose(out, gates * x_new + (1 - gates) * x_prev,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(enc.apply_residual(x_new, x_prev)),
                               x_new + x_prev, rtol=1e-6)


def test_variational_encoding(rng):
    mu = rng.standard_normal((V, D)).astype(np.float32)
    log_sigma = (0.1 * rng.standard_normal((V, D))).astype(np.float32)
    z = np.asarray(enc.apply_variational(jax.random.PRNGKey(0), mu, log_sigma))
    assert z.shape == mu.shape
    kl = float(enc.variational_kl_penalty(mu, log_sigma))
    want = -0.0005 * np.sum(1 + 2 * log_sigma - mu**2 - np.exp(2 * log_sigma))
    np.testing.assert_allclose(kl, want, rtol=1e-4)
