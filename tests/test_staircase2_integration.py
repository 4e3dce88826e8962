"""Integration tests for the fused v2 aggregation path through
apply_gcn_layer / RGCNModel / TrainLoop."""
import dataclasses

import jax
import numpy as np
import pytest

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.graph import build_graph_batch
from relationprediction_tpu.models import build_model
from relationprediction_tpu.models import encoders as enc


def random_graph(rng, v, r, e, **kwargs):
    triples = np.stack([rng.integers(0, v, e), rng.integers(0, r, e),
                        rng.integers(0, v, e)], axis=1).astype(np.int32)
    return triples


@pytest.mark.parametrize("variant,n_bases", [("block", 8), ("basis", 3)])
def test_layer_sc2_matches_segment_path(variant, n_bases):
    rng = np.random.default_rng(0)
    v, r, e, d = 200, 9, 700, 32
    triples = random_graph(rng, v, r, e)
    g_plain = build_graph_batch(triples, v, r, pad_to=768)
    g_sc2 = build_graph_batch(triples, v, r, pad_to=768, staircase2=True,
                              s2_rb=64, s2_chunk=128)
    assert g_sc2.sc2_fwd is not None

    params = enc.init_gcn_layer(jax.random.PRNGKey(1), variant,
                                n_relations=r, d_in=d, d_out=d,
                                n_bases=n_bases)
    feats = np.asarray(
        rng.standard_normal((v, d)).astype(np.float32))

    def run(g):
        return enc.apply_gcn_layer(
            params, variant, g, feats, n_bases=n_bases,
            use_nonlinearity=True, dropout_keep=1.0, deterministic=True,
            rng=None, n_vertices=v)

    a = np.asarray(run(g_plain))
    b = np.asarray(run(g_sc2))
    np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("variant,n_bases", [("block", 8), ("basis", 3)])
def test_layer_sc2_grads_match(variant, n_bases):
    rng = np.random.default_rng(1)
    v, r, e, d = 120, 6, 400, 16
    triples = random_graph(rng, v, r, e)
    g_plain = build_graph_batch(triples, v, r, pad_to=512)
    g_sc2 = build_graph_batch(triples, v, r, pad_to=512, staircase2=True,
                              s2_rb=64, s2_chunk=128)
    params = enc.init_gcn_layer(jax.random.PRNGKey(2), variant,
                                n_relations=r, d_in=d, d_out=d,
                                n_bases=n_bases)
    feats = np.asarray(rng.standard_normal((v, d)).astype(np.float32))
    probe = np.asarray(rng.standard_normal((v, d)).astype(np.float32))

    def loss(p, f, g):
        out = enc.apply_gcn_layer(
            p, variant, g, f, n_bases=n_bases, use_nonlinearity=False,
            dropout_keep=1.0, deterministic=True, rng=None, n_vertices=v)
        return (out * probe).sum()

    g1 = jax.grad(loss, argnums=(0, 1))(params, feats, g_plain)
    g2 = jax.grad(loss, argnums=(0, 1))(params, feats, g_sc2)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def _gcn_cfg(toy_dataset, exp):
    ds = toy_dataset
    cfg = config_lib.load(f"/root/reference/settings/{exp}.exp")
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, code_dimension=16,
                                    internal_dimension=16, n_bases=4),
        decoder=dataclasses.replace(cfg.decoder, code_dimension=16))
    return cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))


@pytest.mark.parametrize("exp", ["gcn_block", "gcn_basis"])
def test_model_prefers_sc2_and_shapes_static(toy_dataset, exp):
    """make_graph builds sc2 by default for block/basis models, and
    repeated builds with pad_to produce identical static shapes."""
    cfg = _gcn_cfg(toy_dataset, exp)
    model = build_model(cfg)
    assert model.preferred_staircase2
    ds = toy_dataset
    pad = model.graph_pad_bound(len(ds.train))
    rng = np.random.default_rng(0)
    shapes = set()
    for _ in range(3):
        sub = np.asarray(ds.train)[
            rng.choice(len(ds.train), size=30, replace=False)]
        g = model.make_graph(sub, pad_to=pad)
        assert g.sc2_fwd is not None
        assert g.bucket_rel is None
        shapes.add(tuple(x.shape for x in jax.tree_util.tree_leaves(g)))
    assert len(shapes) == 1


def test_trainloop_gcn_block_learns_with_sc2(toy_dataset):
    """End-to-end: the default gcn_block training path now runs through
    the fused kernel (interpret mode on CPU) and learns on Toy."""
    from relationprediction_tpu.training import TrainLoop

    cfg = _gcn_cfg(toy_dataset, "gcn_block")
    model = build_model(cfg)
    loop = TrainLoop(model, cfg, toy_dataset, seed=0, prefetch=False,
                     log=lambda m: None)
    first = loop.fit(max_iterations=1)
    more = loop.fit(params=first.params, opt_state=first.opt_state,
                    max_iterations=14, start_iteration=1)
    assert np.isfinite(more.last_loss)
    assert more.last_loss < first.last_loss


def test_mesh_run_drops_sc2(toy_dataset):
    """Graphs carrying sc2 layouts still execute correctly under a mesh
    (the fused layout is dropped, falling back to segment-sum)."""
    from relationprediction_tpu.parallel import (make_mesh,
                                                 make_sharded_train_step,
                                                 replicate, shard_batch)
    from relationprediction_tpu.training import BatchPipeline
    from relationprediction_tpu.training.optimizers import build_optimizer

    cfg = _gcn_cfg(toy_dataset, "gcn_basis")
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh()
    pipeline = BatchPipeline(model, cfg, toy_dataset,
                             np.random.default_rng(0),
                             shard_multiple=int(mesh.devices.size))
    batch = pipeline.next()
    opt = build_optimizer(cfg.optimizer)
    step = make_sharded_train_step(model, opt, mesh)
    params_r = replicate(mesh, params)
    opt_r = replicate(mesh, opt.init(params))
    g, t, y, m = shard_batch(mesh, batch.graph, batch.triples,
                             batch.labels, batch.mask)
    _, _, loss = step(params_r, opt_r, g, t, y, m, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
