"""Per-direction sorted edge layouts must not change any numerics."""
import jax
import numpy as np

from relationprediction_tpu import graph as graph_lib
from relationprediction_tpu.models import encoders as enc
from tests.oracles import numpy_rgcn as oracle

V, R, E, D, B = 12, 5, 40, 8, 4


def test_sorted_layout_structure(rng):
    edges = np.stack([rng.integers(0, V, E), rng.integers(0, R, E),
                      rng.integers(0, V, E)], 1).astype(np.int32)
    g = graph_lib.build_graph_batch(edges, V, R, pad_to=48,
                                    sort_directions=True)
    assert g.fwd_sorted and g.bwd_sorted
    recv = np.asarray(g.receivers)
    mask = np.asarray(g.mask).astype(bool)
    assert np.all(np.diff(recv[mask]) >= 0)           # receiver-sorted
    bs = np.asarray(g.b_senders)
    bmask = np.asarray(g.b_mask).astype(bool)
    assert np.all(np.diff(bs[bmask]) >= 0)            # sender-sorted
    # both copies hold the same multiset of edges
    prim = sorted(map(tuple, np.stack(
        [np.asarray(g.senders)[mask], np.asarray(g.relations)[mask],
         recv[mask]], 1)))
    back = sorted(map(tuple, np.stack(
        [bs[bmask], np.asarray(g.b_relations)[bmask],
         np.asarray(g.b_receivers)[bmask]], 1)))
    assert prim == back == sorted(map(tuple, edges))


def test_basis_layer_sorted_matches_oracle(rng):
    edges = np.stack([rng.integers(0, V, E), rng.integers(0, R, E),
                      rng.integers(0, V, E)], 1).astype(np.int32)
    g = graph_lib.build_graph_batch(edges, V, R, pad_to=48,
                                    sort_directions=True)
    params = enc.init_gcn_layer(jax.random.PRNGKey(0), "basis",
                                n_relations=R, d_in=D, d_out=D, n_bases=B)
    features = rng.standard_normal((V, D)).astype(np.float32)
    got = np.asarray(enc.apply_gcn_layer(
        params, "basis", g, features, n_bases=B, use_nonlinearity=True,
        dropout_keep=1.0, deterministic=True, rng=None, n_vertices=V))
    want = oracle.basis_layer(edges, features,
                              {k: np.asarray(v) for k, v in params.items()},
                              V)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sorted_sharded_step_matches(toy_dataset):
    """Direction-sorted graphs shard correctly (b_* arrays included)."""
    import dataclasses

    from relationprediction_tpu import config as config_lib
    from relationprediction_tpu.models import build_model
    from relationprediction_tpu.parallel import (make_mesh,
                                                 make_sharded_train_step,
                                                 replicate, shard_batch)
    from relationprediction_tpu.training import BatchPipeline
    from relationprediction_tpu.training.optimizers import build_optimizer

    ds = toy_dataset
    cfg = config_lib.load("/root/reference/settings/gcn_basis.exp")
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, code_dimension=16,
                                    internal_dimension=16, n_bases=4),
        decoder=dataclasses.replace(cfg.decoder, code_dimension=16))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    opt = build_optimizer(cfg.optimizer)
    batch = BatchPipeline(model, cfg, ds, np.random.default_rng(0)).next()
    # Staircase layouts are the default now; this test exercises the
    # direction-sorted (b_*) layout, so build it explicitly.
    graph = model.make_graph(ds.train,
                             pad_to=batch.graph.n_padded_edges,
                             staircase=False, staircase2=False)
    assert graph.fwd_sorted
    batch = batch._replace(graph=graph)

    rng_key = jax.random.PRNGKey(7)

    def single_step(p, s, g, t, y, m, rng):
        def loss_fn(p):
            return model.loss(p, g, t, y, m, rng=rng, deterministic=False)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(grads, s, p)
        return jax.tree_util.tree_map(lambda a, b: a + b, p, u), s, loss

    p1, _, loss1 = jax.jit(single_step)(params, opt.init(params),
                                        batch.graph, batch.triples,
                                        batch.labels, batch.mask, rng_key)

    mesh = make_mesh()
    step = make_sharded_train_step(model, opt, mesh)
    pr = replicate(mesh, params)
    sr = replicate(mesh, opt.init(params))
    g, t, y, m = shard_batch(mesh, batch.graph, batch.triples, batch.labels,
                             batch.mask)
    p2, _, loss2 = step(pr, sr, g, t, y, m, rng_key)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)
