"""Relation-bucketed GraphBatch layout: structure + numerics parity."""
import jax
import numpy as np

from relationprediction_tpu import graph as graph_lib
from relationprediction_tpu.models import encoders as enc
from tests.oracles import numpy_rgcn as oracle

V, R, E, D, B = 12, 5, 40, 8, 4


def random_edges(rng, n_edges=E):
    return np.stack([rng.integers(0, V, n_edges),
                     rng.integers(0, R, n_edges),
                     rng.integers(0, V, n_edges)], 1).astype(np.int32)


def test_bucketed_structure(rng):
    edges = random_edges(rng)
    g = graph_lib.build_graph_batch(edges, V, R, bucket_size=8, shard_align=2)
    assert g.bucket_size == 8
    assert g.n_padded_edges % (8 * 2) == 0
    rel = np.asarray(g.relations).reshape(-1, 8)
    bucket_rel = np.asarray(g.bucket_rel)
    # every bucket single-relation and matching bucket_rel
    assert np.all(rel == bucket_rel[:, None])
    # all real edges present exactly once
    mask = np.asarray(g.mask).astype(bool)
    real = np.stack([np.asarray(g.senders)[mask], np.asarray(g.relations)[mask],
                     np.asarray(g.receivers)[mask]], 1)
    assert sorted(map(tuple, real)) == sorted(map(tuple, edges))
    # padding edges point at the phantom vertex
    assert np.all(np.asarray(g.senders)[~mask] == V)
    assert np.all(np.asarray(g.receivers)[~mask] == V)


def test_bucketed_normalization_matches(rng):
    edges = random_edges(rng)
    g = graph_lib.build_graph_batch(edges, V, R, bucket_size=8)
    w = np.asarray(g.fwd_norm)
    mask = np.asarray(g.mask).astype(bool)
    recv = np.asarray(g.receivers)[mask]
    expected = oracle.degree_weights(recv, V)
    np.testing.assert_allclose(w[mask], expected, rtol=1e-6)
    assert np.all(w[~mask] == 0)


def test_block_layer_bucketed_matches_oracle(rng):
    edges = random_edges(rng)
    g = graph_lib.build_graph_batch(edges, V, R, bucket_size=8)
    params = enc.init_gcn_layer(jax.random.PRNGKey(3), "block",
                                n_relations=R, d_in=D, d_out=D, n_bases=B)
    features = rng.standard_normal((V, D)).astype(np.float32)
    got = np.asarray(enc.apply_gcn_layer(
        params, "block", g, features, n_bases=B, use_nonlinearity=True,
        dropout_keep=1.0, deterministic=True, rng=None, n_vertices=V))
    want = oracle.block_layer(edges,
                              features,
                              {k: np.asarray(v) for k, v in params.items()},
                              V, n_blocks=B)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bucketed_matches_unbucketed_layer(rng):
    edges = random_edges(rng)
    g_flat = graph_lib.build_graph_batch(edges, V, R, pad_to=48)
    g_buck = graph_lib.build_graph_batch(edges, V, R, bucket_size=16)
    params = enc.init_gcn_layer(jax.random.PRNGKey(4), "block",
                                n_relations=R, d_in=D, d_out=D, n_bases=B)
    features = rng.standard_normal((V, D)).astype(np.float32)

    def run(g):
        return np.asarray(enc.apply_gcn_layer(
            params, "block", g, features, n_bases=B, use_nonlinearity=False,
            dropout_keep=1.0, deterministic=True, rng=None, n_vertices=V))

    np.testing.assert_allclose(run(g_flat), run(g_buck), rtol=1e-4,
                               atol=1e-5)


def test_model_make_graph_uses_buckets(toy_dataset):
    import dataclasses

    from relationprediction_tpu import config as config_lib
    from relationprediction_tpu.models import build_model

    ds = toy_dataset
    cfg = config_lib.load("/root/reference/settings/gcn_block.exp")
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, code_dimension=16,
                                    internal_dimension=16, n_bases=4),
        decoder=dataclasses.replace(cfg.decoder, code_dimension=16))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    model = build_model(cfg)
    assert model.preferred_bucket_size == 64
    # default now prefers the fused v2 layout (no buckets needed)...
    assert model.make_graph(ds.train).sc2_fwd is not None
    # ...but the bucketed layout remains the fallback (mesh / opt-out)
    g = model.make_graph(ds.train, staircase2=False)
    assert g.bucket_rel is not None
    # loss runs through the bucketed path
    params = model.init_params(jax.random.PRNGKey(0))
    loss = model.loss(params, g, np.asarray(ds.train),
                      np.ones(len(ds.train), np.float32),
                      rng=jax.random.PRNGKey(1), deterministic=True)
    assert np.isfinite(float(loss))

    # basis model prefers no buckets
    cfg2 = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, concatenation=False))
    assert build_model(cfg2).preferred_bucket_size is None


def test_graph_pad_bound_stable_shapes(rng):
    """Different random subgraphs with the same pad bound produce identical
    array shapes (single compiled executable across steps)."""
    from relationprediction_tpu import config as config_lib
    from relationprediction_tpu.models import build_model
    import dataclasses

    cfg = config_lib.load("/root/reference/settings/gcn_block.exp")
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, code_dimension=16,
                                         internal_dimension=16, n_bases=4),
        decoder=dataclasses.replace(cfg.decoder, code_dimension=16))
    cfg = cfg.with_counts(V, R, 100)
    model = build_model(cfg)
    bound = model.graph_pad_bound(30)
    shapes = set()
    for _ in range(5):
        edges = random_edges(rng, 30)
        g = model.make_graph(edges, pad_to=bound)
        shapes.add(g.senders.shape)
    assert len(shapes) == 1
