"""Stored-message (incremental) encoder variant — BasisGcnStore."""
import dataclasses

import jax
import numpy as np

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.models import build_model
from relationprediction_tpu.training import TrainLoop


def stored_config(ds):
    cfg = config_lib.load("/root/reference/settings/gcn_basis.exp")
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, code_dimension=16,
                                    internal_dimension=16, n_bases=4,
                                    store_edge_data=True),
        decoder=dataclasses.replace(cfg.decoder, code_dimension=16))
    return cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))


def test_stored_variant_detected(toy_dataset):
    cfg = stored_config(toy_dataset)
    model = build_model(cfg)
    assert model.has_state
    assert cfg.encoder.gcn_variant == "basis_stored"
    state = model.init_cache_state()
    assert len(state) == cfg.encoder.n_layers
    assert state[0]["cached_messages_f"].shape == \
        (len(toy_dataset.train) + 1, 16)


def test_stored_loss_and_cache_update(toy_dataset):
    ds = toy_dataset
    cfg = stored_config(ds)
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    state = model.init_cache_state()

    graph = model.make_graph(ds.train, pad_to=64)
    edge_ids = np.full(graph.n_padded_edges, len(ds.train), dtype=np.int32)
    edge_ids[:len(ds.train)] = np.arange(len(ds.train))

    triples = np.asarray(ds.train)
    labels = np.ones(len(ds.train), np.float32)
    loss1, state1 = model.loss_stateful(params, state, graph,
                                        edge_ids, triples, labels,
                                        rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss1))
    # caches were written: batch rows non-zero
    cm = np.asarray(state1[0]["cached_messages_f"])
    assert np.abs(cm[:len(ds.train)]).sum() > 0
    # phantom padding row stays zero
    np.testing.assert_array_equal(cm[len(ds.train)], 0.0)

    # Second pass with warm caches: deltas vanish, vertex cache unchanged.
    loss2, state2 = model.loss_stateful(params, state1, graph,
                                        edge_ids, triples, labels,
                                        rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(state1[0]["cached_vertex_embeddings"]),
        np.asarray(state2[0]["cached_vertex_embeddings"]),
        rtol=1e-4, atol=1e-5)


def test_stored_trains_end_to_end(toy_dataset):
    cfg = stored_config(toy_dataset)
    model = build_model(cfg)
    loop = TrainLoop(model, cfg, toy_dataset, seed=0, log=lambda s: None,
                     prefetch=False)
    result = loop.fit(max_iterations=15)
    assert np.isfinite(result.last_loss)
    assert result.iterations == 15
