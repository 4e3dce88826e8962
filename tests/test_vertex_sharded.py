"""Vertex-sharded encoder: exact parity with the single-chip encode."""
import dataclasses

import jax
import numpy as np
import pytest

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.models import build_model
from relationprediction_tpu.parallel import make_mesh
from relationprediction_tpu.parallel.vertex_sharded import (
    VertexShardedEncoder, partition_edges_by_destination)


def setup(toy_dataset):
    ds = toy_dataset
    cfg = config_lib.load("/root/reference/settings/gcn_basis.exp")
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, code_dimension=16,
                                    internal_dimension=16, n_bases=4),
        decoder=dataclasses.replace(cfg.decoder, code_dimension=16))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    return ds, build_model(cfg)


def test_partitioning_covers_all_edges(toy_dataset, rng):
    ds, model = setup(toy_dataset)
    f, b, rows_per = partition_edges_by_destination(
        ds.train, ds.n_entities, 4, pad_to=64, n_relations=ds.n_relations)
    f_sen, f_rel, f_rec, f_msk, f_nrm = f
    assert f_msk.sum() == len(ds.train)
    # every real edge's receiver belongs to its shard
    for s in range(4):
        m = f_msk[s] > 0
        assert np.all(f_rec[s][m] // rows_per == s)
        # receiver-sorted within shard
        assert np.all(np.diff(f_rec[s][m]) >= 0)


def test_vertex_sharded_matches_single_chip(toy_dataset):
    ds, model = setup(toy_dataset)
    mesh = make_mesh(4)
    vs = VertexShardedEncoder(model, mesh)
    params = model.init_params(jax.random.PRNGKey(0))

    f, b = vs.prepare(ds.train, pad_to=64)
    padded = vs.pad_params(params)
    encode = vs.encode_fn()
    sharded_codes = np.asarray(encode(padded, f, b))[:ds.n_entities]

    graph = model.make_graph(ds.train, pad_to=64)
    want = np.asarray(model.encode(params, graph,
                                   deterministic=True).entity_codes)
    np.testing.assert_allclose(sharded_codes, want, rtol=2e-4, atol=2e-5)


def test_vertex_sharded_rejects_unsupported(toy_dataset):
    ds, model = setup(toy_dataset)
    cfg = dataclasses.replace(
        model.config,
        encoder=dataclasses.replace(model.config.encoder,
                                    concatenation=True, n_bases=4))
    block_model = build_model(cfg)
    with pytest.raises(ValueError):
        VertexShardedEncoder(block_model, make_mesh(4))
