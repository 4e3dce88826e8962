"""Factored binomial loss: exact parity with the tiled corruption batch.

``RGCNModel.loss_binomial_factored`` must reproduce the reference's
binomial protocol (``auxilliaries.py:13-33`` tile + coin flip) to float
tolerance — same corruption draws, same CE mean, same regularization
means — for both loss values and gradients.
"""
import dataclasses

import jax
import numpy as np
import pytest

from relationprediction_tpu import config as config_lib
from relationprediction_tpu.models import build_model
from relationprediction_tpu.training import TrainLoop
from relationprediction_tpu.training.device_sampling import (
    device_negative_parts, device_negative_sample)

RATE = 7


def model_for(decoder_name, ds, settings="distmult"):
    cfg = config_lib.load(f"/root/reference/settings/{settings}.exp")
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, code_dimension=16,
                                    internal_dimension=16, n_bases=4),
        decoder=dataclasses.replace(cfg.decoder, name=decoder_name,
                                    code_dimension=16, embedding_width=16,
                                    decoder_dimension=16))
    cfg = cfg.with_counts(ds.n_entities, ds.n_relations, len(ds.train))
    return build_model(cfg), cfg


def tiled_and_factored(model, params, graph, positives, pos_mask, key,
                       n_entities):
    t, y, m = device_negative_sample(positives, pos_mask, RATE, n_entities,
                                     key)
    want = model.loss(params, graph, t, y, m, deterministic=True,
                      rng=jax.random.PRNGKey(1))
    values, co = device_negative_parts(positives, RATE, n_entities, key)
    got = model.loss_binomial_factored(params, graph, positives, pos_mask,
                                       values, co, deterministic=True,
                                       rng=jax.random.PRNGKey(1))
    return float(want), float(got)


@pytest.mark.parametrize("decoder_name", ["bilinear-diag", "complex"])
def test_factored_matches_tiled_embedding(toy_dataset, decoder_name):
    ds = toy_dataset
    model, _ = model_for(decoder_name, ds)
    params = model.init_params(jax.random.PRNGKey(0))
    positives = np.asarray(ds.train, dtype=np.int32)
    pos_mask = np.ones(len(positives), np.float32)
    want, got = tiled_and_factored(model, params, None, positives, pos_mask,
                                   jax.random.PRNGKey(7), ds.n_entities)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_factored_matches_tiled_with_padding(toy_dataset):
    """Padded positive rows (mask 0) must not contribute, matching the
    tiled path's mask tiling."""
    ds = toy_dataset
    model, _ = model_for("bilinear-diag", ds)
    params = model.init_params(jax.random.PRNGKey(0))
    n = len(ds.train)
    positives = np.zeros((n + 9, 3), np.int32)
    positives[:n] = np.asarray(ds.train, dtype=np.int32)
    pos_mask = np.zeros(n + 9, np.float32)
    pos_mask[:n] = 1.0
    want, got = tiled_and_factored(model, params, None, positives, pos_mask,
                                   jax.random.PRNGKey(3), ds.n_entities)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_factored_matches_tiled_gcn_block_grads(toy_dataset):
    """Full gcn_block path: loss AND gradients match the tiled batch."""
    ds = toy_dataset
    model, _ = model_for("bilinear-diag", ds, settings="gcn_block")
    params = model.init_params(jax.random.PRNGKey(0))
    graph = model.make_graph(ds.train)
    positives = np.asarray(ds.train, dtype=np.int32)
    pos_mask = np.ones(len(positives), np.float32)
    key = jax.random.PRNGKey(11)
    rng = jax.random.PRNGKey(2)

    t, y, m = device_negative_sample(positives, pos_mask, RATE,
                                     ds.n_entities, key)

    def tiled_loss(p):
        return model.loss(p, graph, t, y, m, deterministic=False, rng=rng)

    values, co = device_negative_parts(positives, RATE, ds.n_entities, key)

    def factored_loss(p):
        return model.loss_binomial_factored(p, graph, positives, pos_mask,
                                            values, co, deterministic=False,
                                            rng=rng)

    want, gw = jax.value_and_grad(tiled_loss)(params)
    got, gg = jax.value_and_grad(factored_loss)(params)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for pw, pg in zip(jax.tree_util.tree_leaves(gw),
                      jax.tree_util.tree_leaves(gg)):
        np.testing.assert_allclose(np.asarray(pg), np.asarray(pw),
                                   rtol=2e-4, atol=1e-6)


def test_trainloop_uses_factored_binomial(toy_dataset):
    ds = toy_dataset
    model, cfg = model_for("bilinear-diag", ds)
    loop = TrainLoop(model, cfg, ds, seed=0, log=lambda s: None,
                     prefetch=False, negative_mode="binomial")
    assert loop._use_factored_binomial
    result = loop.fit(max_iterations=40)
    assert np.isfinite(result.last_loss)


def test_trainloop_tiled_fallback_for_mlp(toy_dataset):
    ds = toy_dataset
    model, cfg = model_for("nonlinear-transform", ds)
    loop = TrainLoop(model, cfg, ds, seed=0, log=lambda s: None,
                     prefetch=False, negative_mode="binomial")
    assert not loop._use_factored_binomial
    result = loop.fit(max_iterations=10)
    assert np.isfinite(result.last_loss)


def test_mesh_factored_binomial_matches_single_chip(toy_dataset):
    """Edge-sharded factored binomial == single-chip factored binomial."""
    import jax.numpy as jnp
    from relationprediction_tpu.parallel import make_mesh
    from relationprediction_tpu.parallel.mesh import (
        make_sharded_train_step, replicate, shard_batch)
    from relationprediction_tpu.training.optimizers import build_optimizer

    ds = toy_dataset
    model, cfg = model_for("bilinear-diag", ds, settings="gcn_basis")
    params = model.init_params(jax.random.PRNGKey(0))
    optimizer = build_optimizer(cfg.optimizer)
    opt_state = optimizer.init(params)

    n = len(ds.train)
    pad = -(-n // 8) * 8
    positives = np.zeros((pad, 3), np.int32)
    positives[:n] = np.asarray(ds.train, dtype=np.int32)
    pos_mask = np.zeros(pad, np.float32)
    pos_mask[:n] = 1.0
    graph = model.make_graph(ds.train, pad_to=128, shard_align=8)
    key = jax.random.PRNGKey(5)

    mesh = make_mesh(8)
    step = make_sharded_train_step(model, optimizer, mesh,
                                   negative_mode="binomial",
                                   negative_rate=RATE)
    g, t, y, m = shard_batch(mesh, graph, positives,
                             np.zeros(pad, np.float32), pos_mask)
    p_rep = replicate(mesh, params)
    o_rep = replicate(mesh, opt_state)
    _, _, loss_sharded = step(p_rep, o_rep, g, t, y, m, key)

    # Single chip: emulate the sharded step's per-shard rng folding
    # ((777, axis_index)) so both paths see identical corruption draws,
    # then the sharded loss must equal the single-chip global scalar.
    per = pad // 8
    terms = []
    for d in range(8):
        shard_rng = jax.random.fold_in(jax.random.fold_in(key, 777), d)
        values, co = device_negative_parts(
            jnp.asarray(positives[d * per:(d + 1) * per]), RATE,
            ds.n_entities, shard_rng)
        terms.append((positives[d * per:(d + 1) * per],
                      pos_mask[d * per:(d + 1) * per],
                      np.asarray(values), np.asarray(co)))
    all_pos = np.concatenate([t[0] for t in terms])
    all_mask = np.concatenate([t[1] for t in terms])
    all_vals = np.concatenate([t[2] for t in terms])
    all_co = np.concatenate([t[3] for t in terms])
    loss_single = model.loss_binomial_factored(
        params, model.make_graph(ds.train, pad_to=128), all_pos, all_mask,
        all_vals, all_co, deterministic=False, rng=key)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-5)
