"""Hand-computed multi-layer fixture derived directly from the reference's
equations — independent of tests/oracles/numpy_rgcn.py.

Every expected value below was worked out BY HAND (fractions kept exact
until the final literal) from the reference sources:

  * basis messages: sum_b C[r,b] * (x_src @ W[:,b,:])
    (``gcn_basis.py:39-72``, basis stack contraction + per-relation
    coefficients);
  * block-diagonal messages: blockdiag(W[r]) @ x_src
    (``gcn_basis_concat.py:35-52``);
  * 'global' combine: messages aggregated with a sparse-softmax-of-ones
    incidence == 1/in-degree per receiver (forward) resp. 1/out-degree
    per sender (backward) (``graph_representations.py:82-93``,
    ``gcn_basis.py:74-88``), plus the self-loop x @ W_self; the layer
    bias is created but never added (reference quirk,
    ``gcn_basis.py:29-31`` vs ``combine_messages``);
  * 'local' normalization: 1/count(target, relation)
    (``graph_representations.py:95-107``).

Fixture graph (V=3, R=2), edges (s, r, o):
  e1=(0,0,1)  e2=(2,0,1)  e3=(0,1,1)  e4=(1,0,2)

Layer 1 (basis, d=2, B=1):
  W_fwd = I, C_fwd = [[1],[2]];  W_bwd = swap([[0,1],[1,0]]), C_bwd = 1;
  W_self = 2I;  x = [[1,2],[3,4],[5,6]]
  forward in-degrees: v1 <- {e1,e2,e3} (1/3 each), v2 <- {e4} (1)
  backward out-degrees: v0 -> {e1,e3} (1/2), v1 -> {e4}, v2 -> {e2}
  h = relu(fwd + bwd + self):
    h0 = [4,3]            + [2,4]  = [6, 7]
    h1 = ([1,2]+[5,6]+[2,4])/3 + [6,5] + [6,8]  = [44/3, 17]
    h2 = [3,4] + [4,3] + [10,12]                = [17, 19]

Layer 2 (block, d=2, B=2 blocks of 1x1 == per-relation diagonal):
  W_fwd: r0 -> diag(1,2), r1 -> diag(3,1); W_bwd: r0 -> diag(2,1),
  r1 -> diag(1,1); W_self2 = [[1,1],[0,1]]; no ReLU (last layer).
    out0 = [22,17] + [6, 13]                     = [28, 30]
    out1 = [41/3, 59/3] + [34,19] + [44/3, 95/3] = [187/3, 211/3]
    out2 = [44/3, 34] + [88/3, 17] + [17, 36]    = [61, 87]
"""
import jax
import numpy as np
import pytest

from relationprediction_tpu.graph import (build_graph_batch,
                                          degree_normalization, aggregate)
from relationprediction_tpu.models import encoders as enc

EDGES = np.array([[0, 0, 1], [2, 0, 1], [0, 1, 1], [1, 0, 2]], np.int32)
X = np.array([[1., 2.], [3., 4.], [5., 6.]], np.float32)

H1_EXPECTED = np.array([[6., 7.],
                        [44. / 3., 17.],
                        [17., 19.]], np.float32)
OUT_EXPECTED = np.array([[28., 30.],
                         [187. / 3., 211. / 3.],
                         [61., 87.]], np.float32)


def basis_params():
    return {
        "W_forward": np.eye(2, dtype=np.float32).reshape(2, 1, 2),
        "C_forward": np.array([[1.], [2.]], np.float32),
        "W_backward": np.array([[0., 1.], [1., 0.]],
                               np.float32).reshape(2, 1, 2),
        "C_backward": np.array([[1.], [1.]], np.float32),
        "W_self": 2.0 * np.eye(2, dtype=np.float32),
        # bias deliberately NONZERO: the reference creates but never adds
        # it for basis/block layers — a correct port must ignore it.
        "b": np.array([100., 100.], np.float32),
    }


def block_params():
    w_fwd = np.zeros((2, 2, 1, 1), np.float32)
    w_fwd[0, 0, 0, 0], w_fwd[0, 1, 0, 0] = 1., 2.    # r0 -> diag(1,2)
    w_fwd[1, 0, 0, 0], w_fwd[1, 1, 0, 0] = 3., 1.    # r1 -> diag(3,1)
    w_bwd = np.zeros((2, 2, 1, 1), np.float32)
    w_bwd[0, 0, 0, 0], w_bwd[0, 1, 0, 0] = 2., 1.
    w_bwd[1, 0, 0, 0], w_bwd[1, 1, 0, 0] = 1., 1.
    return {
        "W_forward": w_fwd,
        "W_backward": w_bwd,
        "W_self": np.array([[1., 1.], [0., 1.]], np.float32),
        "b": np.array([-50., -50.], np.float32),
    }


def run_two_layers(graph):
    h1 = enc.apply_gcn_layer(
        basis_params(), "basis", graph, X, n_bases=1,
        use_nonlinearity=True, dropout_keep=1.0, deterministic=True,
        rng=None, n_vertices=3)
    out = enc.apply_gcn_layer(
        block_params(), "block", graph, h1, n_bases=2,
        use_nonlinearity=False, dropout_keep=1.0, deterministic=True,
        rng=None, n_vertices=3)
    return np.asarray(h1), np.asarray(out)


@pytest.mark.parametrize("layout", ["flat", "staircase", "staircase2"])
def test_two_layer_hand_fixture(layout):
    """Basis layer 1 + block layer 2 vs hand-derived literals, on every
    aggregation layout (segment-sum, v1 staircase kernel, fused v2)."""
    kw = {}
    if layout == "staircase":
        kw = dict(staircase=True)
    elif layout == "staircase2":
        kw = dict(staircase2=True)
    graph = build_graph_batch(EDGES, 3, 2, **kw)
    h1, out = run_two_layers(graph)
    np.testing.assert_allclose(h1, H1_EXPECTED, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out, OUT_EXPECTED, rtol=1e-6, atol=1e-6)


def test_two_layer_hand_fixture_padded():
    """Padding edges must not change the hand values (phantom-row drop)."""
    graph = build_graph_batch(EDGES, 3, 2, pad_to=16)
    h1, out = run_two_layers(graph)
    np.testing.assert_allclose(h1, H1_EXPECTED, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out, OUT_EXPECTED, rtol=1e-6, atol=1e-6)


def test_local_normalization_hand_fixture():
    """'local' weights = 1/count(target, relation)
    (``graph_representations.py:95-107``): layer-1 basis aggregation under
    local normalization, by hand:

      forward:  v1 gets ([1,2]+[5,6])/2 (rel 0, count 2) + [2,4] (rel 1)
                = [5, 8]; v2 gets [3, 4]
      backward: v0 gets [4,3] (rel 0) + [4,3] (rel 1) = [8, 6];
                v1 gets [6,5]; v2 gets [4,3]
    """
    graph = build_graph_batch(EDGES, 3, 2, normalization="local")
    p = basis_params()

    def messages(feats, vertices, relations, w, c):
        t = np.einsum("ed,dbo->ebo", feats[vertices], w)
        return np.einsum("ebo,eb->eo", t, c[relations])

    s, r, o = (np.asarray(graph.senders), np.asarray(graph.relations),
               np.asarray(graph.receivers))
    fwd_w = degree_normalization(graph, "forward", "local")
    bwd_w = degree_normalization(graph, "backward", "local")
    feats_pad = np.concatenate([X, np.zeros((1, 2), np.float32)])
    fwd = messages(feats_pad, np.minimum(s, 3), r, p["W_forward"],
                   p["C_forward"])
    bwd = messages(feats_pad, np.minimum(o, 3), r, p["W_backward"],
                   p["C_backward"])
    coll_f = np.asarray(aggregate(fwd, np.asarray(fwd_w), o, 3))
    coll_b = np.asarray(aggregate(bwd, np.asarray(bwd_w), s, 3))
    np.testing.assert_allclose(
        coll_f, [[0., 0.], [5., 8.], [3., 4.]], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        coll_b, [[8., 6.], [6., 5.], [4., 3.]], rtol=1e-6, atol=1e-6)
